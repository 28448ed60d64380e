"""Smoke tests for SABL, VFNet, RepPoints (+ plain DeformConv op)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


def _gts():
    return (jnp.asarray([[8.0, 8.0, 60.0, 60.0], [0.0, 0.0, 0.0, 0.0]]),
            jnp.asarray([2, 0], jnp.int32), jnp.asarray([True, False]))


def _imgs(hw=128):
    return jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (1, hw, hw, 3)), jnp.float32)


class TestPlainDeformConv:
    def test_zero_offset_equals_conv(self):
        from lowlightenvironmentvideoobjectdetection_tpu.ops.deform_conv import (
            deform_conv,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 8, 4), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
        got = deform_conv(x, jnp.zeros((8, 8, 18)), w)
        ref = jax.lax.conv_general_dilated(
            x[None], w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestSABL:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            sabl_head as S,
        )

        model = S.SABLRetinaNet(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        assert outs[0][1].shape[-1] == S.SIDE_NUM * 4
        flat = [(c[0], b[0], o[0]) for c, b, o in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: S.sabl_loss(f, gt_b, gt_l, gt_v, 4))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: S.sabl_decode(f, (128, 128), 4, nms_pre=50,
                                              max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_bucket_roundtrip(self):
        """Perfect bucket predictions decode back to (nearly) the gt box."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            sabl_head as S,
        )

        props = jnp.asarray([[20.0, 20.0, 60.0, 60.0]])
        gt = jnp.asarray([[24.0, 18.0, 58.0, 66.0]])
        offs, offw, onehot, _ = S.bbox2bucket(props, gt)
        # build ideal predictions: logits peaked at the right bucket,
        # offsets = targets
        bucket_cls = onehot * 20.0
        boxes, conf = S.bucket2bbox(props, bucket_cls, offs)
        np.testing.assert_allclose(np.asarray(boxes), np.asarray(gt),
                                   atol=0.5)
        assert float(conf[0]) > 0.5


class TestVFNet:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            vfnet_head as V,
        )

        model = V.VFNet(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        # refined distances are positive multiples of the initial ones
        assert float(jnp.min(outs[0][2])) >= 0.0
        flat = [(c[0], i[0], r[0]) for c, i, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: V.vfnet_loss(f, gt_b, gt_l, gt_v, 4))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: V.vfnet_decode(f, (128, 128), 4, nms_pre=50,
                                               max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_varifocal_loss_iou_weighted(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            vfnet_head as V,
        )

        logits = jnp.asarray([[2.0, -2.0]])
        # higher-quality target weights the positive BCE more
        hi = V.varifocal_loss(logits, jnp.asarray([[0.9, 0.0]]))
        lo = V.varifocal_loss(logits, jnp.asarray([[0.1, 0.0]]))
        assert float(hi) != float(lo)
        assert np.isfinite(float(hi))


class TestRepPoints:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            reppoints_head as R,
        )

        model = R.RepPointsDetector(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        assert outs[0][1].shape[-1] == 2 * R.NUM_POINTS
        flat = [(c[0], i[0], r[0]) for c, i, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: R.reppoints_loss(f, gt_b, gt_l, gt_v, 4))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: R.reppoints_decode(
            f, (128, 128), 4, nms_pre=50, max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_points_to_boxes_moment(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            reppoints_head as R,
        )

        # points spread ±1 cell around the center at stride 8
        pts = jnp.tile(jnp.asarray(
            [(dy, dx) for dy in (-1.0, 0.0, 1.0) for dx in (-1.0, 0.0, 1.0)],
            jnp.float32).reshape(1, -1), (1, 1))
        centers = jnp.asarray([[32.0, 32.0]])
        boxes = R.points_to_boxes(pts, centers, 8)
        b = np.asarray(boxes[0])
        # symmetric box around (32, 32)
        assert abs((b[0] + b[2]) / 2 - 32.0) < 1e-4
        assert abs((b[1] + b[3]) / 2 - 32.0) < 1e-4
        assert b[2] > b[0] and b[3] > b[1]


class TestZooRegistrationBatch2:
    def test_registered(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa
        from lowlightenvironmentvideoobjectdetection_tpu.registry import (
            MODELS,
        )

        for name in ("VFNet", "RepPoints", "SABL"):
            assert MODELS.get(name) is not None
