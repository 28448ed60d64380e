"""RAW (RGGB, 8-channel pair) path end-to-end (VERDICT r2 missing #4).

Drives configs/vid/llvod/llvod_raw_darkfarm.py exactly as the CLIs do:

1. tools/train.py build_system -> SelsaDarkfarmDetect(in_channels=4) with a
   4-channel backbone stem; one train step on an 8-ch pair batch — loss
   finite, gradients FLOW TO THE 4-CH STEM (not just somewhere).
2. The SeqsRGB2RAW -> SeqNormalizeRAW pipeline from the config produces the
   8-ch pairs the model contract expects.
3. Streaming eval: the tools/test.py model coercion keeps
   backbone_in_channels=4 (the round-2 bug dropped it, silently evaluating
   a 3-ch plain model), the eval module's param tree EQUALS the train
   tree's `selsa` subtree, and a RAW frame streams through inference.

Reference: dark_resnet.py:712-733 (DarkRAWResNet in_channels=4),
resclean.py:23 (ResRAWCleaner), pipelines/transforms.py:958-1131 (sRGB2RAW).
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW_CFG = os.path.join(REPO, "configs/vid/llvod/llvod_raw_darkfarm.py")


def _train_mod():
    spec = importlib.util.spec_from_file_location(
        "train_cli_raw", os.path.join(REPO, "tools", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
class TestRawEndToEnd:
    def test_train_step_grads_reach_4ch_stem(self):
        from lowlightenvironmentvideoobjectdetection_tpu.config import Config

        T = _train_mod()
        cfg = Config.fromfile(RAW_CFG)
        # unfreeze the stem: the config's reference-default frozen_stages=1
        # (ImageNet warm-start protocol) would rightly zero conv1 grads
        cfg["model"]["frozen_stages"] = -1
        model, anchors, loss_fn, synth, make_batch = T.build_system(
            cfg, tiny=True)
        assert model.cfg.in_channels == 4

        rng = np.random.RandomState(0)
        batch = synth(rng)
        assert batch.pair_imgs.shape[-1] == 8  # RGGB noise ++ RGGB clean

        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 8), jnp.float32))

        # locate the detector stem conv: kernel [k, k, 4, 64]
        stem = variables["params"]["selsa"]["backbone"]["conv1"]["kernel"]
        assert stem.shape[2] == 4, stem.shape

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        g_stem = grads["params"]["selsa"]["backbone"]["conv1"]["kernel"]
        assert g_stem.shape[2] == 4
        assert float(jnp.abs(g_stem).sum()) > 0, "no gradient at the RAW stem"
        # the feature-consistency loss is active (loss_<type>_<stage> keys)
        assert any(k.startswith(("loss_l1", "loss_l2", "loss_smooth"))
                   for k in metrics), sorted(metrics)

    def test_raw_pipeline_emits_8ch_pairs(self):
        from lowlightenvironmentvideoobjectdetection_tpu.config import Config
        from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines import (
            Compose,
        )
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa

        cfg = Config.fromfile(RAW_CFG)
        # skip the disk-loading stage; feed decoded 6-ch pairs directly
        steps = [s for s in cfg["train_pipeline"]
                 if s["type"] not in ("LoadMutiImagePairsFromFile",
                                      "SeqLoadAnnotations")]
        pipe = Compose(steps)
        rng = np.random.RandomState(0)
        frames = []
        for _ in range(2):
            img = rng.randint(0, 255, (64, 80, 6)).astype(np.uint8)
            frames.append(dict(
                img=img, img_shape=img.shape, ori_shape=img.shape,
                gt_bboxes=np.asarray([[4.0, 4.0, 30.0, 30.0]], np.float32),
                gt_labels=np.asarray([1], np.int64),
                img_info=dict(frame_id=0), frame_id=0))
        out = pipe(frames)
        img = out["img"]
        assert img.shape[-1] == 8, img.shape  # 4-ch RGGB noise + clean
        assert np.isfinite(np.asarray(img, np.float32)).all()

    def test_stream_eval_model_matches_train_subtree(self):
        """The coerced eval model (tools/test.py mcfg logic) must have the
        SAME param tree as the train tree's `selsa` subtree — and stream a
        RAW frame."""
        from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
            VIDModel,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.config import Config

        T = _train_mod()
        cfg = Config.fromfile(RAW_CFG)
        model, anchors, loss_fn, synth, make_batch = T.build_system(
            cfg, tiny=True)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 8), jnp.float32))

        # tools/test.py coercion: drop train-only keys, KEEP the stem width
        mcfg = dict(cfg["model"])
        mcfg.pop("type")
        mcfg["out_indices"] = (3,)
        mcfg.pop("loss_type", None)
        in_ch = mcfg.pop("in_channels", None)
        if in_ch and in_ch != 3:
            mcfg.setdefault("backbone_in_channels", in_ch)
        for k in ("with_aggregator", "agg_rdb", "agg_taf", "dual_branch",
                  "denoiser", "with_cleaner"):
            mcfg.pop(k, None)
        mcfg.update(T.TINY_KW)
        mcfg["compute_dtype"] = jnp.float32
        vid = VIDModel(model_type="SELSA", **mcfg)
        assert vid.cfg.backbone_in_channels == 4

        train_sub = {c: t["selsa"] for c, t in variables.items()
                     if isinstance(t, dict) and "selsa" in t}
        want = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.shape, vid.params))
        got = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.shape, train_sub))
        assert want == got, "eval module tree != train selsa subtree"
        # shape agreement leaf-by-leaf (frozen/variant backbones included)
        jax.tree_util.tree_map(
            lambda a, b: (_ for _ in ()).throw(
                AssertionError((a.shape, b.shape)))
            if a.shape != b.shape else None, vid.params, train_sub)

        vid.params = train_sub
        raw_frame = np.random.RandomState(1).uniform(
            0, 1, (64, 64, 8)).astype(np.float32)
        r = vid.inference_vid_prepared(raw_frame, frame_id=0)
        assert "bbox_results" in r and len(r["bbox_results"]) == 8
