"""Tests for the single-stage family (FPN, RetinaNet, YOLOv3), the
TemporalRoIAlign extractor, and the image-space video denoisers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


class TestFPN:
    def test_shapes_on_input_extra(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.fpn import FPN

        neck = FPN(out_channels=32, num_outs=5, add_extra_convs="on_input",
                   dtype=jnp.float32)
        feats = [jnp.zeros((1, 32 // 2**i, 32 // 2**i, 16 * 2**i))
                 for i in range(3)]
        params = neck.init(jax.random.PRNGKey(0), feats)
        outs = neck.apply(params, feats)
        assert len(outs) == 5
        assert outs[0].shape == (1, 32, 32, 32)
        assert outs[3].shape == (1, 4, 4, 32)
        assert outs[4].shape == (1, 2, 2, 32)

    def test_maxpool_extra(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.fpn import FPN

        neck = FPN(out_channels=16, num_outs=4, add_extra_convs="maxpool",
                   dtype=jnp.float32)
        feats = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)),
                 jnp.zeros((1, 4, 4, 32))]
        params = neck.init(jax.random.PRNGKey(0), feats)
        outs = neck.apply(params, feats)
        assert outs[3].shape == (1, 2, 2, 16)


class TestRetinaNet:
    def _setup(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.retina_head import (
            RetinaNet, retina_anchor_generator,
        )

        model = RetinaNet(num_classes=4, depth=50, dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.RandomState(7).uniform(-1, 1, (1, 64, 64, 3)), jnp.float32
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        return model, params, imgs

    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            retina_head as rh,
        )

        model, params, imgs = self._setup()
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5  # P3..P7
        # level 0 = stride 8 on a 64px image
        assert outs[0][0].shape == (1, 8, 8, 9 * 4)
        assert outs[0][1].shape == (1, 8, 8, 9 * 4)

        gen = rh.retina_anchor_generator()
        shapes = [(o[0].shape[1], o[0].shape[2]) for o in outs]
        anchors = [jnp.asarray(a) for a in gen.grid_anchors(shapes)]
        gt_boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
        gt_labels = jnp.asarray([2], jnp.int32)
        gt_valid = jnp.asarray([True])
        flat_outs = [(o[0][0], o[1][0]) for o in outs]
        loss = rh.retina_loss(flat_outs, anchors, gt_boxes, gt_labels,
                              gt_valid, (64, 64), num_classes=4)
        assert np.isfinite(float(loss.loss_cls))
        assert np.isfinite(float(loss.loss_bbox))
        assert float(loss.loss_cls) > 0

        det = rh.retina_decode(flat_outs, anchors, (64, 64), num_classes=4,
                               nms_pre=100, max_per_img=10)
        assert det.boxes.shape == (10, 4)
        assert det.labels.shape == (10,)

    def test_loss_decreases(self):
        """One SGD step on the focal loss should reduce it (grads flow)."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            retina_head as rh,
        )

        model, params, imgs = self._setup()
        gen = rh.retina_anchor_generator()
        gt_boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
        gt_labels = jnp.asarray([2], jnp.int32)
        gt_valid = jnp.asarray([True])

        def loss_fn(p):
            outs = model.apply(p, imgs)
            shapes = [(o[0].shape[1], o[0].shape[2]) for o in outs]
            anchors = [jnp.asarray(a) for a in gen.grid_anchors(shapes)]
            flat = [(o[0][0], o[1][0]) for o in outs]
            l = rh.retina_loss(flat, anchors, gt_boxes, gt_labels, gt_valid,
                               (64, 64), num_classes=4)
            return l.loss_cls + l.loss_bbox

        l0, g = jax.value_and_grad(loss_fn)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert gnorm > 0  # gradients flow to the head
        l1 = min(
            float(loss_fn(jax.tree.map(lambda a, b: a - lr * b, params, g)))
            for lr in (1e-3, 1e-4, 1e-5)
        )
        assert l1 < float(l0)


class TestYOLOV3:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            yolov3 as y,
        )

        model = y.YOLOV3(num_classes=3, dtype=jnp.float32)
        imgs = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        preds = jax.jit(model.apply)(params, imgs)
        assert len(preds) == 3
        # coarsest level: 64/32 = 2
        assert preds[0].shape == (1, 2, 2, 3 * (5 + 3))
        assert preds[2].shape == (1, 8, 8, 3 * (5 + 3))

        gt_boxes = jnp.asarray([[8.0, 8.0, 48.0, 48.0]])
        gt_labels = jnp.asarray([1], jnp.int32)
        gt_valid = jnp.asarray([True])
        flat = [p[0] for p in preds]
        loss = y.yolo_loss(flat, gt_boxes, gt_labels, gt_valid, num_classes=3)
        for v in loss:
            assert np.isfinite(float(v))
        assert float(loss.loss_conf) > 0

        det = y.yolo_detect(flat, num_classes=3, img_shape=(64, 64),
                            nms_pre=50, max_per_img=5)
        assert det.boxes.shape == (5, 4)

    def test_decode_grid_offsets(self):
        """A strong logit in one cell decodes near that cell's center."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            yolov3 as y,
        )

        pred = np.zeros((4, 4, 3 * 8), np.float32)  # C=3, stride 8 level
        p = pred.reshape(4, 4, 3, 8)
        p[2, 1, 0, 4] = 10.0  # objectness at cell (row 2, col 1)
        boxes, conf, cls = y.yolo_decode_level(
            jnp.asarray(pred), y.YOLO_ANCHORS[2], 8, 3, (32, 32)
        )
        i = int(np.argmax(np.asarray(conf)))
        cx = float((boxes[i, 0] + boxes[i, 2]) / 2)
        cy = float((boxes[i, 1] + boxes[i, 3]) / 2)
        assert 8 <= cx <= 16  # col 1 -> x in [8, 16)
        assert 16 <= cy <= 24  # row 2 -> y in [16, 24)


class TestTemporalRoIAlign:
    def test_shapes_and_identity_without_refs(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.temporal_roi_align import (
            TemporalRoIAlign,
        )

        mod = TemporalRoIAlign(out_channels=32, num_temporal_attention_blocks=4)
        roi_feats = jnp.asarray(
            np.random.RandomState(0).randn(6, 7, 7, 32), jnp.float32
        )
        ref_feats = jnp.asarray(
            np.random.RandomState(1).randn(3, 8, 8, 32), jnp.float32
        )
        params = mod.init(jax.random.PRNGKey(0), roi_feats, ref_feats)
        out = mod.apply(params, roi_feats, ref_feats)
        assert out.shape == roi_feats.shape
        assert np.all(np.isfinite(np.asarray(out)))
        # no refs -> passthrough
        same = mod.apply(params, roi_feats, None)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(roi_feats))

    def test_most_similar_prefers_identical_pixel(self):
        """If a ref map contains the roi pixel exactly, MSRA should gather
        (mostly) that pixel."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.temporal_roi_align import (
            TemporalRoIAlign,
        )

        mod = TemporalRoIAlign(num_most_similar_points=1)
        v = np.random.RandomState(0).randn(16).astype(np.float32)
        roi = np.zeros((1, 1, 1, 16), np.float32)
        roi[0, 0, 0] = v
        ref = np.random.RandomState(1).randn(1, 4, 4, 16).astype(np.float32)
        ref[0, 2, 3] = v * 2  # same direction, larger norm — cosine max
        out = mod.most_similar_roi_align(jnp.asarray(roi), jnp.asarray(ref))
        np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), v * 2, rtol=1e-5)


class TestVideoDenoisers:
    def test_fastdvd_window_and_clip(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.cleaners.video_denoisers import (
            FastDVDnet, fastdvd_denoise_clip,
        )

        model = FastDVDnet()
        win = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (32, 32, 15)), jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), win)
        out = model.apply(params, win)
        assert out.shape == (32, 32, 3)

        frames = jnp.asarray(
            np.random.RandomState(1).uniform(0, 1, (4, 32, 32, 3)), jnp.float32
        )
        clip = fastdvd_denoise_clip(model, params, frames)
        assert clip.shape == frames.shape
        assert np.all(np.isfinite(np.asarray(clip)))

    def test_unet_residual(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.cleaners.video_denoisers import (
            Unet,
        )

        model = Unet()
        img = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (32, 32, 3)), jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(params, img)
        assert out.shape == img.shape


class TestFastDVDSelsa:
    def test_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaConfig,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa_fastdvd import (
            FastDVDBatch, FastDVDSelsaConfig, fastdvd_selsa_loss,
            make_fastdvd_selsa,
        )

        tiny = SelsaConfig(
            pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=32,
            test_nms_pre=64, test_nms_post=16, num_roi_samples=16,
            num_classes=5, compute_dtype=jnp.float32,
        )
        model, anchors = make_fastdvd_selsa(FastDVDSelsaConfig(selsa=tiny))
        rng = np.random.RandomState(0)
        pair = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 6)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), pair)
        batch = FastDVDBatch(
            pair_imgs=pair,
            img_shape=jnp.asarray([64.0, 64.0]),
            gt_boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
            gt_labels=jnp.asarray([2], jnp.int32),
            gt_valid=jnp.asarray([True]),
        )
        total, metrics = jax.jit(
            lambda p, b, r: fastdvd_selsa_loss(model, p, b, r, anchors)
        )(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        assert "loss_denoise" in metrics
        assert float(metrics["loss_denoise"]) > 0


class TestZooRegistry:
    def test_new_names_registered(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import (
            AGGREGATORS, CLEANERS, MODELS, NECKS,
        )

        for name in ("RetinaNet", "YOLOV3", "SiamRPN", "SelsaFastDVDnetDetect"):
            assert name in MODELS, name
        for name in ("FastDVDnet", "Unet", "ResCleaner"):
            assert name in CLEANERS, name
        assert "FPN" in NECKS
        assert "Denoising2Aggergator" in AGGREGATORS  # reference typo kept
