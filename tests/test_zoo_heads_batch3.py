"""Smoke tests for SparseRCNN, YOLACT, CornerNet/CentripetalNet, PISA,
NASFCOS + the corner-pool op."""

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


class TestCornerPoolOp:
    def test_modes(self):
        from lowlightenvironmentvideoobjectdetection_tpu.ops.corner_pool import (
            corner_pool,
        )

        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
        top = corner_pool(x, "top")
        # out[i,j] = max over i' >= i  -> row 0 = bottom row values
        np.testing.assert_allclose(np.asarray(top[0, :, 0]), [8, 9, 10, 11])
        bottom = corner_pool(x, "bottom")
        np.testing.assert_allclose(np.asarray(bottom[2, :, 0]), [8, 9, 10, 11])
        left = corner_pool(x, "left")
        np.testing.assert_allclose(np.asarray(left[:, 0, 0]), [3, 7, 11])
        right = corner_pool(x, "right")
        np.testing.assert_allclose(np.asarray(right[:, 3, 0]), [3, 7, 11])


class TestSparseRCNN:
    def test_forward_loss_detect(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            sparse_rcnn as SR,
        )

        model = SR.SparseRCNN(num_classes=4, num_proposals=10, num_stages=2,
                              dtype=jnp.float32)
        imgs = _imgs(64)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = model.apply(params, imgs)
        assert len(outs) == 2
        assert outs[0][0].shape == (10, 4) and outs[0][1].shape == (10, 4)

        gt_b, gt_l, gt_v = _gts()
        loss = SR.sparse_rcnn_loss(outs, gt_b, gt_l, gt_v, (64, 64), 4)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = SR.sparse_rcnn_detect(outs, 4, max_per_img=5)
        assert det.boxes.shape == (5, 4)

    def test_learnable_proposals_cover_image(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            sparse_rcnn as SR,
        )

        model = SR.SparseRCNN(num_classes=4, num_proposals=4, num_stages=1,
                              dtype=jnp.float32)
        imgs = _imgs(64)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        init = params["params"]["init_proposal_bboxes"]
        np.testing.assert_allclose(np.asarray(init),
                                   [[0.5, 0.5, 1.0, 1.0]] * 4)


class TestYOLACT:
    def test_forward_loss_detect(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            yolact_head as Y,
        )

        model = Y.YOLACT(num_classes=4, dtype=jnp.float32)
        imgs = _imgs(128)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        level_outs, protos, segm = jax.jit(model.apply)(params, imgs)
        assert len(level_outs) == 5
        assert protos.shape[-1] == Y.NUM_PROTOS
        # protonet upsamples P3 (stride 8) to stride 4
        assert protos.shape[-3] == 32 and protos.shape[-2] == 32

        gt_b, gt_l, gt_v = _gts()
        gt_masks = jnp.zeros((2, 128, 128)).at[0, 8:60, 8:60].set(1.0)
        flat = [(c[0], r[0], k[0]) for c, r, k in level_outs]
        loss = Y.yolact_loss(flat, protos, segm[0], gt_b, gt_l, gt_v,
                             gt_masks, (128, 128), 4)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det, masks = Y.yolact_detect(flat, protos, (128, 128), 4,
                                     nms_pre=50, max_per_img=5)
        assert det.boxes.shape == (5, 4)
        assert masks.shape[0] == 5


class TestCornerNet:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            corner_head as C,
        )

        model = C.CornerNet(num_classes=3, stacks=1, hg_depth=2,
                            hg_channels=(32, 32, 48), feat_channel=32,
                            dtype=jnp.float32)
        imgs = _imgs(64)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        tl, br = jax.jit(model.apply)(params, imgs)
        assert tl[0].shape == (1, 16, 16, 3)  # heat at stride 4
        assert tl[1].shape[-1] == 1  # embedding

        gt_b, gt_l, gt_v = _gts()
        flat_tl = tuple(t[0] for t in tl)
        flat_br = tuple(t[0] for t in br)
        loss = C.corner_loss(flat_tl, flat_br, gt_b, gt_l, gt_v, (64, 64), 3)
        for v in loss:
            assert np.isfinite(float(v)), loss
        boxes, scores, labels, valid = C.corner_decode(flat_tl, flat_br, 3,
                                                       k=5, max_per_img=5)
        assert boxes.shape == (5, 4)

    def test_centripetal_variant(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            corner_head as C,
        )

        model = C.CentripetalNet(num_classes=3, stacks=1, hg_depth=2,
                                 hg_channels=(32, 32, 48), feat_channel=32,
                                 dtype=jnp.float32)
        imgs = _imgs(64)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        tl, br = jax.jit(model.apply)(params, imgs)
        assert tl[1].shape[-1] == 2  # centripetal shift is 2-D
        gt_b, gt_l, gt_v = _gts()
        flat_tl = tuple(t[0] for t in tl)
        flat_br = tuple(t[0] for t in br)
        loss = C.corner_loss(flat_tl, flat_br, gt_b, gt_l, gt_v, (64, 64), 3,
                             centripetal=True)
        for v in loss:
            assert np.isfinite(float(v)), loss
        out = C.corner_decode(flat_tl, flat_br, 3, k=5, max_per_img=5,
                              centripetal=True)
        assert out[0].shape == (5, 4)

    def test_gaussian_targets_peak_at_corner(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            corner_head as C,
        )

        t = C.gaussian_targets(jnp.asarray([[4.0, 6.0]]), jnp.asarray([2.0]),
                               jnp.asarray([True]), 16, 16,
                               jnp.asarray([1], jnp.int32), 3)
        assert t.shape == (16, 16, 3)
        assert float(t[6, 4, 1]) > 0.99
        assert float(t[6, 4, 0]) == 0.0


class TestPISAAndNASFCOS:
    def test_pisa_retina_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            pisa_nasfcos as P,
            retina_head as R,
        )

        model = R.RetinaNet(num_classes=4, dtype=jnp.float32)
        imgs = _imgs(128)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        gen = R.retina_anchor_generator()
        shapes = [(o[0].shape[1], o[0].shape[2]) for o in outs]
        anchors = [jnp.asarray(a) for a in gen.grid_anchors(shapes)]
        flat = [(c[0], r[0]) for c, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = P.pisa_retina_loss(flat, anchors, gt_b, gt_l, gt_v,
                                  (128, 128), 4)
        for v in loss:
            assert np.isfinite(float(v)), loss
        assert float(loss.loss_carl) >= 0

    def test_isr_weights_rank_order(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            pisa_nasfcos as P,
        )

        labels = jnp.asarray([1, 1, 1, 0], jnp.int32)
        ious = jnp.asarray([0.9, 0.6, 0.7, 0.8])
        pos = jnp.asarray([True, True, True, False])
        w = P.isr_p_weights(labels, ious, pos, num_classes=3)
        # highest-IoU positive gets the largest weight within its class
        assert float(w[0]) > float(w[2]) > float(w[1])
        assert float(w[3]) == 1.0  # negatives untouched

    def test_nasfcos_registered(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa
        from lowlightenvironmentvideoobjectdetection_tpu.registry import (
            MODELS,
        )

        for n in ("NASFCOS", "PISA", "SparseRCNN", "YOLACT", "CornerNet",
                  "CentripetalNet"):
            assert MODELS.get(n) is not None
