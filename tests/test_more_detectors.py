"""Tests for FCOS, SSD, and Cascade R-CNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


def _gts():
    return (jnp.asarray([[8.0, 8.0, 60.0, 60.0]]),
            jnp.asarray([2], jnp.int32), jnp.asarray([True]))


class TestFCOS:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            fcos_head as F,
        )

        model = F.FCOS(num_classes=4, dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (1, 128, 128, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        assert outs[0][0].shape == (1, 16, 16, 4)   # cls
        assert outs[0][1].shape == (1, 16, 16, 4)   # ltrb
        assert outs[0][2].shape == (1, 16, 16, 1)   # centerness

        flat = [(c[0], d[0], t[0]) for c, d, t in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = F.fcos_loss(flat, gt_b, gt_l, gt_v, num_classes=4)
        for v in loss:
            assert np.isfinite(float(v)), loss
        assert float(loss.loss_cls) > 0

        det = jax.jit(lambda f: F.fcos_decode(f, (128, 128), 4, nms_pre=100,
                                              max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_center_point_is_positive(self):
        """A point at the gt center within range must be assigned."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            fcos_head as F,
        )

        # single level grid 16x16 stride 8 -> point (60, 60) cell exists
        cls = jnp.zeros((16, 16, 4))
        dist = jnp.ones((16, 16, 4))
        ctr = jnp.zeros((16, 16, 1))
        gt_b = jnp.asarray([[40.0, 40.0, 80.0, 80.0]])  # 40px box, level-0 range
        loss = F.fcos_loss([(cls, dist, ctr)] + [
            (jnp.zeros((1, 1, 4)), jnp.ones((1, 1, 4)), jnp.zeros((1, 1, 1)))
        ] * 4, gt_b, jnp.asarray([1], jnp.int32), jnp.asarray([True]), 4)
        assert float(loss.loss_bbox) > 0  # positives exist


class TestSSD:
    def test_forward_levels_and_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            ssd as S,
        )

        model = S.SSD(num_classes=3, dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (1, 300, 300, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 6
        hw = [(o[0].shape[1], o[0].shape[2]) for o in outs]
        assert hw == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
        # anchors per level: 4, 6, 6, 6, 4, 4
        assert outs[0][0].shape[-1] == 4 * (3 + 1)
        assert outs[1][0].shape[-1] == 6 * (3 + 1)

        flat = [(c[0], r[0]) for c, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = S.ssd_loss(flat, gt_b, gt_l, gt_v, num_classes=3)
        assert np.isfinite(float(loss.loss_cls))
        assert float(loss.loss_cls) > 0

        det = jax.jit(lambda f: S.ssd_decode(f, (300, 300), 3, nms_pre=100,
                                             max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_hard_negative_mining_bounds_negatives(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            ssd as S,
        )

        shapes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
        anchors = S.ssd_anchors(shapes)
        total = sum(a.shape[0] for a in anchors)
        assert total == 38*38*4 + 19*19*6 + 10*10*6 + 5*5*6 + 3*3*4 + 4


class TestCascade:
    def test_loss_and_detect(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.cascade_rcnn import (
            cascade_detect, cascade_loss, make_cascade_rcnn,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.faster_rcnn import (
            DetTrainBatch,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaConfig,
        )

        tiny = SelsaConfig(pad_h=64, pad_w=64, train_nms_pre=64,
                           train_nms_post=32, test_nms_pre=64, test_nms_post=16,
                           num_roi_samples=16, num_classes=5,
                           compute_dtype=jnp.float32)
        model, anchors = make_cascade_rcnn(tiny)
        img = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (64, 64, 3)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), img[None])
        batch = DetTrainBatch(img, jnp.asarray([64.0, 64.0]),
                              jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
                              jnp.asarray([2], jnp.int32),
                              jnp.asarray([True]))
        total, metrics = jax.jit(
            lambda p, b, r: cascade_loss(model, p, b, r, anchors)
        )(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        for st in range(3):
            assert f"s{st}.loss_cls" in metrics

        det = jax.jit(
            lambda p, im: cascade_detect(model, p, im,
                                         jnp.asarray([64.0, 64.0]), anchors)
        )(params, img)
        assert det.boxes.shape == (100, 4)
        assert np.all(np.isfinite(np.asarray(det.boxes)))

    def test_zoo(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

        for name in ("FCOS", "SSD", "CascadeRCNN"):
            assert name in MODELS


class TestATSS:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            atss_head as A,
        )

        model = A.ATSS(num_classes=3, dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (1, 128, 128, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        assert outs[0][0].shape == (1, 16, 16, 3)  # 1 anchor/loc
        flat = [(c[0], r[0], t[0]) for c, r, t in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: A.atss_loss(f, gt_b, gt_l, gt_v, 3))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: A.atss_decode(f, (128, 128), 3, nms_pre=100,
                                              max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_adaptive_assignment_selects_inside_anchors(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            atss_head as A,
        )

        shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
        level_anchors = A.atss_anchors(shapes)
        gt = jnp.asarray([[30.0, 30.0, 90.0, 90.0]])
        assigned = A.atss_assign(level_anchors, gt, jnp.asarray([True]))
        pos_idx = np.nonzero(np.asarray(assigned) >= 0)[0]
        assert len(pos_idx) > 0
        anchors = np.asarray(jnp.concatenate(level_anchors))
        centers = (anchors[pos_idx, :2] + anchors[pos_idx, 2:]) / 2
        assert (centers > 30).all() and (centers < 90).all()

    def test_no_valid_gt(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            atss_head as A,
        )

        shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        level_anchors = A.atss_anchors(shapes)
        gt = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
        assigned = A.atss_assign(level_anchors, gt, jnp.asarray([False]))
        assert (np.asarray(assigned) == -1).all()

    def test_zoo_atss(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

        assert "ATSS" in MODELS


class TestMaskRCNN:
    def _tiny(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.mask_rcnn import (
            make_mask_rcnn,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaConfig,
        )

        cfg = SelsaConfig(pad_h=64, pad_w=64, train_nms_pre=64,
                          train_nms_post=32, test_nms_pre=64, test_nms_post=16,
                          num_roi_samples=16, num_classes=3,
                          compute_dtype=jnp.float32)
        return make_mask_rcnn(cfg)

    def test_loss_and_detect_with_masks(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.mask_rcnn import (
            MaskRCNN, MaskTrainBatch, mask_rcnn_detect, mask_rcnn_loss,
        )

        model, anchors = self._tiny()
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.uniform(-1, 1, (64, 64, 3)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), img[None])
        gt_masks = np.zeros((2, 64, 64), np.float32)
        gt_masks[0, 10:40, 8:44] = 1.0
        gt_masks[1, 20:60, 30:60] = 1.0
        batch = MaskTrainBatch(
            img, jnp.asarray([64.0, 64.0]),
            jnp.asarray([[8.0, 10.0, 44.0, 40.0], [30.0, 20.0, 60.0, 60.0]]),
            jnp.asarray([1, 2], jnp.int32), jnp.asarray([True, True]),
            jnp.asarray(gt_masks),
        )
        total, metrics = jax.jit(
            lambda p, b, r: mask_rcnn_loss(model, p, b, r, anchors)
        )(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        assert "loss_mask" in metrics and float(metrics["loss_mask"]) > 0

        dets, masks = jax.jit(
            lambda p, im: mask_rcnn_detect(model, p, im,
                                           jnp.asarray([64.0, 64.0]), anchors)
        )(params, img)
        assert masks.shape == (dets.boxes.shape[0], 64, 64)
        assert masks.dtype == jnp.bool_

    def test_mask_targets_crop(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.mask_head import (
            mask_targets,
        )

        gm = np.zeros((1, 32, 32), np.float32)
        gm[0, 8:24, 8:24] = 1.0  # square mask
        rois = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])  # roi == mask extent
        t = mask_targets(jnp.asarray(gm), jnp.asarray([0]), rois, mask_size=8)
        # the full target should be (almost) all ones
        assert float(t.mean()) > 0.9

    def test_paste_masks_inside_box(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.mask_head import (
            paste_masks,
        )

        probs = jnp.ones((1, 4, 4))
        boxes = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
        full = paste_masks(probs, boxes, 32, 32)
        m = np.asarray(full[0])
        assert m[15, 15] and not m[5, 5] and not m[25, 25]

    def test_zoo_maskrcnn(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

        assert "MaskRCNN" in MODELS


class TestDETR:
    def test_forward_loss_detect(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            detr as D,
        )

        model = D.DETR(num_classes=3, num_queries=20, dim=64, enc_layers=1,
                       dec_layers=1)
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (1, 64, 64, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        cls_logits, boxes = jax.jit(model.apply)(params, imgs)
        assert cls_logits.shape == (1, 20, 4)  # [L, Q, C+1] per dec layer
        assert boxes.shape == (1, 20, 4)
        assert float(boxes.min()) >= 0 and float(boxes.max()) <= 1

        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda c, b: D.detr_loss_all(
            c, b, gt_b, gt_l, gt_v, (64, 64), 3))(cls_logits, boxes)
        for v in loss:
            assert np.isfinite(float(v)), loss

        det = jax.jit(lambda c, b: D.detr_detect(c, b, (64, 64), 3,
                                                 max_per_img=10))(
            cls_logits[-1], boxes[-1])
        assert det.boxes.shape == (10, 4)

    def test_hungarian_matches_each_gt_once(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.detr import (
            _hungarian_host,
        )

        cost = np.asarray([[0.1, 5.0], [5.0, 0.1], [1.0, 1.0]])
        m = _hungarian_host(cost)  # per-gt matched query
        assert m.tolist() == [0, 1]

    def test_loss_decreases(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            detr as D,
        )

        model = D.DETR(num_classes=3, num_queries=12, dim=64, enc_layers=1,
                       dec_layers=1)
        imgs = jnp.asarray(
            np.random.RandomState(1).uniform(-1, 1, (1, 64, 64, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        gt_b, gt_l, gt_v = _gts()

        def lf(p):
            c, b = model.apply(p, imgs)
            l = D.detr_loss_all(c, b, gt_b, gt_l, gt_v, (64, 64), 3)
            return l.loss_cls + l.loss_bbox + l.loss_giou

        l0, g = jax.value_and_grad(lf)(params)
        l1 = min(float(lf(jax.tree.map(lambda a, b_: a - lr * b_, params, g)))
                 for lr in (1e-3, 1e-4, 1e-5))
        assert l1 < float(l0)

    def test_zoo_detr(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

        assert "DETR" in MODELS


class TestGFL:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            gfl_head as G,
        )

        model = G.GFL(num_classes=3, reg_max=8, dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (1, 128, 128, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert outs[0][1].shape == (1, 16, 16, 4 * 9)  # 4*(reg_max+1)
        flat = [(c[0], r[0]) for c, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: G.gfl_loss(f, gt_b, gt_l, gt_v, 3, reg_max=8))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: G.gfl_decode(f, (128, 128), 3, reg_max=8,
                                             nms_pre=100, max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_integral_expectation(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.gfl_head import (
            _integral,
        )

        # delta distribution on bin 3 -> expected distance 3
        logits = np.full((1, 4 * 9), -20.0, np.float32)
        logits[0, 3] = 20.0            # side 0 bin 3
        logits[0, 9 + 5] = 20.0        # side 1 bin 5
        logits[0, 18 + 0] = 20.0       # side 2 bin 0
        logits[0, 27 + 8] = 20.0       # side 3 bin 8
        d = np.asarray(_integral(jnp.asarray(logits), 8))
        np.testing.assert_allclose(d[0], [3, 5, 0, 8], atol=1e-3)

    def test_zoo_gfl(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

        assert "GFL" in MODELS


class TestRetinaSepBN:
    def test_shared_kernels_separate_norms(self):
        """RetinaSepBNHead's defining structure (retina_sepbn_head.py:62-65):
        conv kernels shared across the 5 levels, norm affines separate per
        level per stack."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.retina_head import (
            RetinaSepBNHead,
        )

        head = RetinaSepBNHead(num_classes=4, num_ins=5, feat_channels=32,
                               stacked_convs=2, dtype=jnp.float32)
        feats = [jnp.zeros((1, s, s, 32)) for s in (16, 8, 4, 4, 2)]
        variables = head.init(jax.random.PRNGKey(0), feats)
        p = variables["params"]
        assert sorted(k for k in p if k.startswith("cls_conv")) == [
            "cls_conv0", "cls_conv1"]  # 2 shared kernels, not 2x5
        bn_scales = [k for k in p if k.startswith("cls_bn")
                     and k.endswith("scale")]
        assert len(bn_scales) == 5 * 2  # separate affine per level per stack
        outs = head.apply(variables, feats)
        assert len(outs) == 5
        assert outs[0][0].shape == (1, 16, 16, 9 * 4)
        assert outs[0][1].shape == (1, 16, 16, 9 * 4)

    def test_nasfpn_retinanet_forward_and_zoo(self):
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa

        model, gen = MODELS.get("NASFPNRetinaNet")(
            num_classes=3, stack_times=1, dtype=jnp.float32)
        imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
