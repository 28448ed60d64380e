"""TemporalRoIAlign wired into SELSA (reference: the llvod configs and
selsa_troialign_faster_rcnn_r50_dc5_7e_imagenetvid.py use
roi_extractor TemporalRoIAlign + num_shared_fcs=3) and the insert-plugins
aggregator backbone (insert_resnet.py:93-97)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig,
    SelsaDetector,
    TrainBatch,
    init_params,
    init_video_state,
    inference_step,
    make_anchors,
    selsa_loss,
)

TROI = SelsaConfig(
    pad_h=128,
    pad_w=128,
    train_nms_pre=256,
    train_nms_post=64,
    test_nms_pre=256,
    test_nms_post=32,
    num_roi_samples=32,
    num_ref_frames=2,
    num_classes=5,
    compute_dtype=jnp.float32,
    roi_extractor="temporal",
    num_shared_fcs=3,
)


@pytest.fixture(scope="module")
def system():
    model = SelsaDetector(cfg=TROI)
    params = init_params(model, jax.random.PRNGKey(0), small=False)
    anchors = make_anchors(TROI)
    return model, params, anchors


def _batch():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(-2, 2, (3, 128, 128, 3)).astype(np.float32))
    gt = jnp.asarray([[10.0, 20.0, 60.0, 80.0], [40.0, 30.0, 100.0, 90.0],
                      [0.0, 0.0, 0.0, 0.0]])
    return TrainBatch(
        imgs=imgs,
        img_shape=jnp.asarray([120.0, 120.0]),
        gt_boxes=gt,
        gt_labels=jnp.asarray([1, 3, -1], jnp.int32),
        gt_valid=jnp.asarray([True, True, False]),
    )


def test_troi_train_loss_and_grads(system):
    model, params, anchors = system
    batch = _batch()

    def lf(p):
        loss, _ = selsa_loss(model, p, batch, jax.random.PRNGKey(1), anchors)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(lf))(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves_with_path(grads)
    troi = [float(jnp.sum(jnp.abs(v))) for k, v in flat
            if "troi" in jax.tree_util.keystr(k)]
    assert len(troi) > 0, "temporal extractor params missing from the tree"
    assert sum(troi) > 0, "no gradient reaches the temporal extractor"
    # third shared FC + its aggregator exist (num_shared_fcs=3)
    names = {jax.tree_util.keystr(k) for k, _ in flat}
    assert any("shared_fc2" in n for n in names)
    assert any("aggregator2" in n for n in names)


def test_troi_streaming_inference(system):
    model, params, anchors = system
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.uniform(-2, 2, (3, 128, 128, 3)).astype(np.float32))
    shape = jnp.asarray([120.0, 120.0])
    scale = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    state = init_video_state(model, params, imgs[:2], shape, anchors)
    assert state.ref_maps is not None, (
        "temporal extractor must cache reference neck maps in the memo"
    )
    assert state.ref_maps.shape[0] == 2
    step = jax.jit(
        lambda p, s, f, um: inference_step(
            model, p, s, f, shape, scale, anchors, update_memo=um
        ),
        static_argnames=("um",),
    )
    for fid in range(2):
        state, dets = step(params, state, imgs[fid], fid % 2 == 0)
    assert np.asarray(dets.boxes).shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(dets.scores)))


def test_plain_state_has_no_ref_maps():
    cfg = SelsaConfig(
        pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=16,
        test_nms_pre=64, test_nms_post=8, num_roi_samples=16,
        num_ref_frames=2, num_classes=3, compute_dtype=jnp.float32,
    )
    model = SelsaDetector(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), small=True)
    anchors = make_anchors(cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = init_video_state(model, params, imgs, jnp.asarray([64.0, 64.0]),
                             anchors)
    assert state.ref_maps is None


def test_insert_plugins_aggregator_backbone():
    """InsertResNet + DenoisingAggregator plugin with rdb/taf knobs
    (reference done/llvod_l1234_insert_plugins_i1234_*_darkfarm.py)."""
    from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.dark_resnet import (
        make_dark_backbone,
    )

    bb = make_dark_backbone(
        "InsertResNet", depth=50, out_indices=(2, 3),
        plugin_stages=(2, 3), plugin_type="aggregator",
        plugin_rdb_blocks=1, plugin_rdb_layers=2, plugin_emb_nums=2,
    )
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(bb.apply)(params, x)
    assert len(outs) == 2
    names = params["params"].keys()
    assert "plugin3" in names and "plugin4" in names
    assert "rdb0" in params["params"]["plugin3"]
    assert "taf" in params["params"]["plugin3"]
