"""Smoke tests for FGFA/DFF (flow-based propagation) and plain Faster R-CNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig,
    TrainBatch,
)

TINY = SelsaConfig(
    pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=32,
    test_nms_pre=64, test_nms_post=16, num_roi_samples=16,
    num_classes=5, compute_dtype=jnp.float32,
)


def _batch(t=2):
    rng = np.random.RandomState(0)
    return TrainBatch(
        imgs=jnp.asarray(rng.uniform(-2, 2, (t, 64, 64, 3)).astype(np.float32)),
        img_shape=jnp.asarray([64.0, 64.0]),
        gt_boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
        gt_labels=jnp.asarray([2], jnp.int32),
        gt_valid=jnp.asarray([True]),
    )


class TestFasterRCNN:
    def test_loss_and_detect(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.faster_rcnn import (
            DetTrainBatch,
            faster_rcnn_detect,
            faster_rcnn_loss,
            make_faster_rcnn,
        )

        model, anchors = make_faster_rcnn(TINY)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        b = _batch()
        batch = DetTrainBatch(b.imgs[0], b.img_shape, b.gt_boxes, b.gt_labels, b.gt_valid)
        total, metrics = faster_rcnn_loss(model, params, batch, jax.random.PRNGKey(1), anchors)
        assert np.isfinite(float(total)) and float(total) > 0
        dets = faster_rcnn_detect(model, params, b.imgs[0], b.img_shape, anchors)
        assert dets.boxes.shape == (100, 4)


class TestFGFA:
    @pytest.fixture(scope="class")
    def system(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.fgfa import make_fgfa

        model, anchors = make_fgfa(TINY)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))
        return model, params, anchors

    def test_loss(self, system):
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.fgfa import fgfa_loss

        model, params, anchors = system
        total, metrics = fgfa_loss(model, params, _batch(3), jax.random.PRNGKey(1), anchors)
        assert np.isfinite(float(total)) and float(total) > 0

    def test_streaming(self, system):
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.fgfa import (
            fgfa_inference_step,
            fgfa_init_state,
        )

        model, params, anchors = system
        rng = np.random.RandomState(1)
        refs = jnp.asarray(rng.uniform(-2, 2, (2, 64, 64, 3)).astype(np.float32))
        state = fgfa_init_state(model, params, refs)
        frame = jnp.asarray(rng.uniform(-2, 2, (64, 64, 3)).astype(np.float32))
        state2, dets = fgfa_inference_step(
            model, params, state, frame, jnp.asarray([64.0, 64.0]), None, anchors
        )
        assert dets.boxes.shape == (100, 4)
        assert int(state2.next_slot) == 1
        # rolling memo replaced slot 0 with the current frame
        np.testing.assert_array_equal(np.asarray(state2.ref_imgs[0]), np.asarray(frame))


class TestDFF:
    def test_loss_and_stream(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.fgfa import (
            DFFState,
            dff_inference_step,
            dff_loss,
            make_dff,
        )

        model, anchors = make_dff(TINY, key_frame_interval=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))
        total, _ = dff_loss(model, params, _batch(2), jax.random.PRNGKey(1), anchors)
        assert np.isfinite(float(total)) and float(total) > 0

        rng = np.random.RandomState(2)
        f0 = jnp.asarray(rng.uniform(-2, 2, (64, 64, 3)).astype(np.float32))
        state = DFFState(
            jnp.zeros((64, 64, 3)), jnp.zeros((4, 4, TINY.neck_channels)),
            jnp.zeros((), jnp.int32),
        )
        state, dets0 = dff_inference_step(
            model, params, state, f0, jnp.asarray([64.0, 64.0]), None, anchors
        )
        # frame 0 is a key frame: memo now holds it
        np.testing.assert_array_equal(np.asarray(state.key_img), np.asarray(f0))
        f1 = jnp.asarray(rng.uniform(-2, 2, (64, 64, 3)).astype(np.float32))
        state, dets1 = dff_inference_step(
            model, params, state, f1, jnp.asarray([64.0, 64.0]), None, anchors
        )
        # frame 1 is non-key: memo unchanged
        np.testing.assert_array_equal(np.asarray(state.key_img), np.asarray(f0))
        assert dets1.boxes.shape == (100, 4)
