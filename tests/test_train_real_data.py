"""End-to-end real-data training of the flagship darkfarm family.

VERDICT r1 item 2: the train CLI's real-data path must build DarkfarmBatch
(pair images, 2C channels) for DARKFARM_TYPES, honor branch='clean' for the
SelsaClean* oracle entries, and --resume-from must restore optimizer state
and step (reference runner.resume(), mmtrack/apis/train.py:131-134).

Runs the tools/train.py machinery in-process on a tiny on-disk COCO-VID
fixture with GT/ pair directories.
"""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_train_module():
    spec = importlib.util.spec_from_file_location(
        "tools_train", os.path.join(REPO, "tools", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def darkfarm_fixture(tmp_path_factory):
    """1 video x 4 frames of (noisy, GT) pairs + COCO-VID annotations."""
    import cv2

    root = tmp_path_factory.mktemp("darkfarm")
    seq = root / "vidA" / "noisy"
    gt = root / "vidA" / "GT"
    seq.mkdir(parents=True)
    gt.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        noisy = rng.randint(0, 60, (48, 64, 3)).astype(np.uint8)
        clean = np.clip(noisy.astype(np.int32) * 3, 0, 255).astype(np.uint8)
        cv2.imwrite(str(seq / f"{i:06d}.jpg"), noisy)
        cv2.imwrite(str(gt / f"{i:06d}.jpg"), clean)
        images.append(dict(
            id=i + 1, video_id=1, frame_id=i,
            file_name=f"vidA/noisy/{i:06d}.jpg", width=64, height=48,
            is_vid_train_frame=True,
        ))
        annotations.append(dict(
            id=i + 1, image_id=i + 1, category_id=1,
            bbox=[8, 8, 24, 20], area=480, iscrowd=0, instance_id=1,
        ))
    ann = dict(
        videos=[dict(id=1, name="vidA")],
        images=images,
        annotations=annotations,
        categories=[dict(id=k + 1, name=n) for k, n in enumerate(
            ("person", "cow", "sheep", "dog", "rabbit", "cat", "hen",
             "duck"))],
    )
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return dict(root=str(root), ann_file=str(ann_file))


def _cfg(fixture, model_type="SelsaDarkfarmDetect"):
    train_pipeline = [
        dict(type="LoadMutiImagePairsFromFile"),
        dict(type="SeqLoadAnnotations"),
        dict(type="SeqResize", img_scale=(64, 48)),
        dict(type="SeqBrighten", m=0.25),
        dict(type="SeqNormalize"),
        dict(type="SeqPad", size_divisor=16),
        dict(type="VideoCollect", keys=["img", "gt_bboxes", "gt_labels"]),
        dict(type="ConcatVideoReferences"),
        dict(type="SeqDefaultFormatBundle"),
    ]
    return dict(
        model=dict(type=model_type, num_classes=8, out_indices=(2, 3, 3),
                   loss_type="l1"),
        data=dict(train=dict(
            type="DarkFarmVIDDataset",
            ann_file=fixture["ann_file"],
            img_prefix=fixture["root"],
            ref_img_sampler=dict(num_ref_imgs=2, frame_range=2,
                                 filter_key_img=True,
                                 method="bilateral_uniform"),
            pipeline=train_pipeline,
        )),
        optimizer=dict(lr=0.002),
        log_config=dict(interval=100),
    )


class TestRealDataDarkfarmTraining:
    def test_flagship_family_trains_on_disk_pairs(self, darkfarm_fixture,
                                                  tmp_path):
        T = _load_train_module()
        cfg = _cfg(darkfarm_fixture)
        model, anchors, loss_fn, synth, make_batch = T.build_system(
            cfg, tiny=True)

        it = T.dataset_iterator(cfg, model, max_gts=8)
        d = next(it)
        # the real-data path must emit 6-channel pairs
        assert d["imgs"].shape[-1] == 6
        b = make_batch(d)
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa_darkfarm import (
            DarkfarmBatch,
        )

        assert isinstance(b, DarkfarmBatch)
        assert b.pair_imgs.shape[-1] == 6

        # two real train steps end-to-end
        from lowlightenvironmentvideoobjectdetection_tpu.apis.train import (
            train_model,
        )

        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))

        def data_iter():
            for dd in T.dataset_iterator(cfg, model, max_gts=8):
                yield jax.tree_util.tree_map(
                    lambda x: x[None], make_batch(dd))

        state = train_model(loss_fn, variables, data_iter(), 2,
                            base_lr=0.002, log_interval=100, n_devices=1)
        assert int(state.step) == 2
        loss_leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert np.all(np.isfinite(np.asarray(loss_leaf, np.float32)))

    def test_clean_branch_wiring(self, darkfarm_fixture):
        """SelsaClean* must train on the CLEAN half: gradients w.r.t. the
        noisy half are exactly zero."""
        T = _load_train_module()
        cfg = _cfg(darkfarm_fixture, model_type="SelsaCleanDarkfarmDetect")
        model, anchors, loss_fn, synth, make_batch = T.build_system(
            cfg, tiny=True)
        rng = np.random.RandomState(0)
        batch = synth(rng)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))

        # branch='clean' must make the loss INVARIANT to the noisy half and
        # sensitive to the clean half (gradients w.r.t. inputs are cut by the
        # frozen stem's stop_gradient, so test loss values directly)
        def loss_of(pair_imgs):
            b = batch._replace(pair_imgs=pair_imgs)
            return float(loss_fn(variables, b, jax.random.PRNGKey(1))[0])

        base = loss_of(batch.pair_imgs)
        noise_perturbed = batch.pair_imgs.at[..., :3].add(0.5)
        clean_perturbed = batch.pair_imgs.at[..., 3:].add(0.5)
        assert loss_of(noise_perturbed) == base, (
            "clean-branch model must ignore the noisy half")
        assert loss_of(clean_perturbed) != base

    def test_resume_restores_optimizer_and_step(self, darkfarm_fixture,
                                                tmp_path):
        T = _load_train_module()
        cfg = _cfg(darkfarm_fixture)
        model, anchors, loss_fn, synth, make_batch = T.build_system(
            cfg, tiny=True)
        rng = np.random.RandomState(0)
        fixed = jax.tree_util.tree_map(lambda x: x[None], synth(rng))

        def data_iter():
            while True:
                yield fixed

        from lowlightenvironmentvideoobjectdetection_tpu.apis.train import (
            train_model,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.utils.checkpoint import (
            save_checkpoint,
        )

        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))

        # continuous 4-step run
        ref = train_model(loss_fn, jax.tree.map(jnp.copy, variables),
                          data_iter(), 4, base_lr=0.01, seed=7,
                          log_interval=100, n_devices=1)

        # 2 steps -> checkpoint -> resume -> 2 more steps
        half = train_model(loss_fn, jax.tree.map(jnp.copy, variables),
                           data_iter(), 2, base_lr=0.01, seed=7,
                           log_interval=100, n_devices=1)
        path = save_checkpoint(str(tmp_path), half, step=2)
        resumed = train_model(loss_fn, jax.tree.map(jnp.copy, variables),
                              data_iter(), 2, base_lr=0.01, seed=7,
                              resume_from=path, log_interval=100,
                              n_devices=1)

        assert int(resumed.step) == 4 == int(ref.step)
        # NOTE: the resumed run re-seeds its rng stream, so exact equality
        # holds only when losses don't depend on the per-step rng draw order;
        # with a fixed batch and the same seed the streams coincide.
        for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-5, atol=2e-6)
