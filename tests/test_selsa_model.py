"""End-to-end smoke tests of the SELSA system on tiny shapes (CPU), in the
spirit of the reference's config-driven forward tests
(mmtracking/tests/test_models/test_forward.py): build the full model, run
forward_train + grads, then streaming inference with the memo carry.
"""

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

TINY = SelsaConfig(
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
)


@pytest.fixture(scope="module")
def system():
    model = SelsaDetector(cfg=TINY)
    params = init_params(model, jax.random.PRNGKey(0), small=False)
    anchors = make_anchors(TINY)
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


class TestSelsaTrain:
    def test_loss_and_grads(self, system):
        model, params, anchors = system
        batch = _batch()

        def loss_fn(p):
            total, metrics = selsa_loss(model, p, batch, jax.random.PRNGKey(1), anchors)
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(total))
        for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
            assert np.isfinite(float(metrics[k])), k
        assert float(total) > 0
        # gradient reaches the bbox head and the rpn
        g = grads["params"]
        gn = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), g["bbox_head"], 0.0
        )
        assert gn > 0
        # frozen stage-1 gets zero grads (stop_gradient), stage-4 does not
        l1 = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))),
            {k: v for k, v in g["backbone"].items() if k.startswith("layer1")},
            0.0,
        )
        l4 = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))),
            {k: v for k, v in g["backbone"].items() if k.startswith("layer4")},
            0.0,
        )
        assert l1 == 0.0 and l4 > 0.0


class TestSelsaStream:
    def test_streaming_inference(self, system):
        model, params, anchors = system
        rng = np.random.RandomState(1)
        ref_imgs = jnp.asarray(rng.uniform(-2, 2, (2, 128, 128, 3)).astype(np.float32))
        img_shape = jnp.asarray([120.0, 120.0])
        sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])

        state = init_video_state(model, params, ref_imgs, img_shape, anchors)
        # head-major memo layout: [nb, S, P, hd]
        assert state.ref_kv[0][0].shape == (16, 2, TINY.test_nms_post, 64)
        assert state.ref_kv[0][1].shape == (16, 2, TINY.test_nms_post, 64)

        frame = jnp.asarray(rng.uniform(-2, 2, (128, 128, 3)).astype(np.float32))
        state2, dets = inference_step(
            model, params, state, frame, img_shape, sf, anchors
        )
        assert dets.boxes.shape == (100, 4)
        assert dets.labels.shape == (100,)
        assert np.isfinite(np.asarray(dets.scores)).all()
        # adaptive-stride mode: memo unchanged
        np.testing.assert_array_equal(
            np.asarray(state2.ref_kv[0][0]), np.asarray(state.ref_kv[0][0])
        )

    def test_streaming_memo_update(self, system):
        model, params, anchors = system
        rng = np.random.RandomState(2)
        ref_imgs = jnp.asarray(rng.uniform(-2, 2, (2, 128, 128, 3)).astype(np.float32))
        img_shape = jnp.asarray([128.0, 128.0])
        state = init_video_state(model, params, ref_imgs, img_shape, anchors)
        frame = jnp.asarray(rng.uniform(-2, 2, (128, 128, 3)).astype(np.float32))
        state2, _ = inference_step(
            model, params, state, frame, img_shape, None, anchors, update_memo=True
        )
        assert int(state2.next_slot) == 1
        # slot 0 replaced (slots live on axis 1 of the head-major memo)
        assert not np.allclose(
            np.asarray(state2.ref_kv[0][0][:, 0]), np.asarray(state.ref_kv[0][0][:, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(state2.ref_kv[0][0][:, 1]), np.asarray(state.ref_kv[0][0][:, 1])
        )
