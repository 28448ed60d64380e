"""Smoke tests for the round-2 R-CNN families: FastRCNN, RPN,
MaskScoringRCNN, PointRend, GridRCNN, TridentFasterRCNN, HTC, SCNet,
GuidedAnchoring, CascadeRPN (reference mmdet/models/detectors/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig,
    make_anchors,
)

TINY = dict(pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=16,
            test_nms_pre=64, test_nms_post=8, num_roi_samples=16,
            compute_dtype=jnp.float32)


def _cfg(num_classes=4):
    return SelsaConfig(num_classes=num_classes, **TINY)


def _det_batch():
    from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.faster_rcnn import (
        DetTrainBatch,
    )

    rng = np.random.RandomState(0)
    return DetTrainBatch(
        img=jnp.asarray(rng.uniform(-2, 2, (64, 64, 3)).astype(np.float32)),
        img_shape=jnp.asarray([60.0, 60.0]),
        gt_boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 0.0, 0.0]]),
        gt_labels=jnp.asarray([1, -1], jnp.int32),
        gt_valid=jnp.asarray([True, False]),
    )


def _mask_batch():
    from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.mask_rcnn import (
        MaskTrainBatch,
    )

    b = _det_batch()
    masks = np.zeros((2, 64, 64), np.float32)
    masks[0, 10:40, 10:40] = 1.0
    return MaskTrainBatch(b.img, b.img_shape, b.gt_boxes, b.gt_labels,
                          b.gt_valid, jnp.asarray(masks))


def _grads_finite(loss_fn, params):
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)), float(loss)
    g = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(grads))
    assert g > 0
    return float(loss), metrics


class TestFastRCNN:
    def test_loss_and_detect(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
            FastRCNN, FastRCNNBatch, fast_rcnn_detect, fast_rcnn_loss,
        )

        cfg = _cfg()
        model = FastRCNN(cfg=cfg)
        b = _det_batch()
        props = jnp.asarray([[6.0, 6.0, 42.0, 42.0]] * 8)
        pv = jnp.ones((8,), bool)
        batch = FastRCNNBatch(b.img, b.img_shape, props, pv, b.gt_boxes,
                              b.gt_labels, b.gt_valid)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        _grads_finite(
            lambda p: fast_rcnn_loss(model, p, batch, jax.random.PRNGKey(1)),
            params)
        dets = fast_rcnn_detect(model, params, b.img, b.img_shape, props, pv)
        assert np.all(np.isfinite(np.asarray(dets.boxes)))


class TestRPNStandalone:
    def test_loss_and_propose(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
            RPN, rpn_only_loss, rpn_propose,
        )

        # small anchors: at 64x64 the default 64..512 px anchors all cross
        # the border and allowed_border=0 zeroes the whole rpn loss
        cfg = SelsaConfig(num_classes=1, anchor_scales=(1, 2), **TINY)
        model = RPN(cfg=cfg)
        anchors = make_anchors(cfg)
        b = _det_batch()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        _grads_finite(
            lambda p: rpn_only_loss(model, p, b, jax.random.PRNGKey(1),
                                    anchors), params)
        props = rpn_propose(model, params, b.img, b.img_shape, anchors)
        assert props.boxes.shape == (cfg.test_nms_post, 4)


class TestMaskScoring:
    def test_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
            MaskScoringRCNN, mask_scoring_loss,
        )

        cfg = _cfg()
        model = MaskScoringRCNN(cfg=cfg)
        anchors = make_anchors(cfg)
        batch = _mask_batch()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        loss, metrics = _grads_finite(
            lambda p: mask_scoring_loss(model, p, batch,
                                        jax.random.PRNGKey(1), anchors),
            params)
        assert "loss_mask_iou" in metrics


class TestPointRend:
    def test_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
            PointRendRCNN, point_rend_loss,
        )

        cfg = _cfg()
        model = PointRendRCNN(cfg=cfg, num_points=16)
        anchors = make_anchors(cfg)
        batch = _mask_batch()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        loss, metrics = _grads_finite(
            lambda p: point_rend_loss(model, p, batch, jax.random.PRNGKey(1),
                                      anchors), params)
        assert "loss_point" in metrics


class TestGridRCNN:
    def test_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
            GridRCNN, grid_rcnn_loss,
        )

        cfg = _cfg()
        model = GridRCNN(cfg=cfg)
        anchors = make_anchors(cfg)
        b = _det_batch()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        loss, metrics = _grads_finite(
            lambda p: grid_rcnn_loss(model, p, b, jax.random.PRNGKey(1),
                                     anchors), params)
        assert "loss_grid" in metrics


class TestTrident:
    def test_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
            TridentFasterRCNN, trident_loss,
        )

        cfg = _cfg()
        model = TridentFasterRCNN(cfg=cfg)
        anchors = make_anchors(cfg)
        b = _det_batch()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        _grads_finite(
            lambda p: trident_loss(model, p, b, jax.random.PRNGKey(1),
                                   anchors), params)


class TestHTCAndSCNet:
    @pytest.mark.parametrize("scnet", [False, True])
    def test_loss(self, scnet):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.htc import (
            htc_loss, make_htc,
        )

        model, anchors = make_htc(_cfg(), scnet=scnet)
        batch = _mask_batch()
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 64, 64, 3)))
        loss, metrics = _grads_finite(
            lambda p: htc_loss(model, p, batch, jax.random.PRNGKey(1),
                               anchors), params)
        assert "loss_semantic" in metrics
        assert "s2.loss_mask" in metrics


class TestGuidedAnchor:
    def test_forward_and_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.guided_anchor_head import (
            GARetinaHead, ga_retina_loss,
        )

        model = GARetinaHead(num_classes=4)
        feats = [jnp.zeros((1, s, s, 256)) for s in (8, 4)]
        params = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
        outs = model.apply(params, feats)
        b = _det_batch()

        def lf(p):
            o = model.apply(p, feats)
            l = ga_retina_loss(o, b.gt_boxes, b.gt_labels, b.gt_valid,
                               b.img_shape, num_classes=4)
            total = sum(jnp.asarray(v) for v in
                        [l.loss_cls, l.loss_bbox, l.loss_shape, l.loss_loc])
            return total, {}

        _grads_finite(lf, params)


class TestCascadeRPN:
    def test_two_stage_refinement_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.cascade_rpn_head import (
            CascadeRPNHead, cascade_rpn_loss,
        )

        model = CascadeRPNHead(feat_channels=64)
        # random features: at EXACTLY zero logits the stable-BCE grad has a
        # 0/0 tie that resolves to zero — a measure-zero artifact
        feat = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 64)) * 0.1
        params = jax.jit(model.init)(jax.random.PRNGKey(0), feat)
        gt = jnp.asarray([[8.0, 8.0, 48.0, 48.0]])
        gv = jnp.asarray([True])

        def lf(p):
            ls = cascade_rpn_loss(model, p, feat, gt, gv)
            return (ls.loss_s1_cls + ls.loss_s1_reg + ls.loss_s2_cls
                    + ls.loss_s2_reg), {}

        _grads_finite(lf, params)
        (c2, r2), r1, anchors, refined = model.apply(params, feat)
        assert c2.shape == (16,) and r1.shape == (16, 4)
        assert anchors.shape == (16, 4) and refined.shape == (16, 4)
