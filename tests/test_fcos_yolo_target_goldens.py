"""Goldens for FCOS point assignment and YOLOv3 grid-cell targets.

- FCOS: independent numpy transcription of mmdet's
  FCOSHead.get_targets/_get_target_single without center sampling
  (mmdetection/mmdet/models/dense_heads/fcos_head.py:221-300) — per-point
  candidate gts by inside-box + regress-range on max(ltrb), min-area wins;
  centerness target formula (fcos_head.py:302-315).
- YOLOv3: the documented grid-cell contract (each valid gt supervises the
  best wh-IoU anchor of its center cell; tx/ty are cell-relative offsets,
  tw/th log size ratios; >neg_iou_thr anchors leave the negative set) —
  checked against a per-gt numpy loop to catch scatter/index/axis bugs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fcos_head import (
    REGRESS_RANGES,
    fcos_points,
    fcos_targets,
)


def _np_fcos_targets(points, ranges, gts, labels):
    """mmdet FCOSHead._get_target_single, numpy, real gts only."""
    p = points.shape[0]
    g = gts.shape[0]
    pos = np.zeros(p, bool)
    tgt_lab = np.zeros(p, np.int64)
    tgt_ltrb = np.zeros((p, 4), np.float64)
    areas = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    for i in range(p):
        x, y = points[i]
        best, best_area = -1, np.inf
        for j in range(g):
            l = x - gts[j, 0]
            t = y - gts[j, 1]
            r = gts[j, 2] - x
            b = gts[j, 3] - y
            if min(l, t, r, b) <= 0:
                continue
            m = max(l, t, r, b)
            if not (ranges[i, 0] <= m <= ranges[i, 1]):
                continue
            if areas[j] < best_area:
                best, best_area = j, areas[j]
        if best >= 0:
            pos[i] = True
            tgt_lab[i] = labels[best]
            tgt_ltrb[i] = [x - gts[best, 0], y - gts[best, 1],
                           gts[best, 2] - x, gts[best, 3] - y]
    return pos, tgt_lab, tgt_ltrb


class TestFCOSTargetGolden:
    @pytest.mark.parametrize("seed", [0, 4, 9])
    def test_matches_numpy_transcription(self, seed):
        rs = np.random.RandomState(seed)
        shapes = [(16, 16), (8, 8), (4, 4)]
        pts = [np.asarray(p) for p in fcos_points(shapes)]
        points = np.concatenate(pts, axis=0)
        ranges = np.concatenate([
            np.tile(np.asarray(REGRESS_RANGES[i], np.float64),
                    (h * w, 1)) for i, (h, w) in enumerate(shapes)
        ])

        g_pad = 6
        cx = rs.uniform(10, 110, g_pad)
        cy = rs.uniform(10, 110, g_pad)
        w = rs.uniform(8, 180, g_pad)   # sizes straddle the regress ranges
        h = rs.uniform(8, 180, g_pad)
        gts = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                       -1).astype(np.float32)
        labels = rs.randint(0, 5, g_pad).astype(np.int32)
        valid = np.ones(g_pad, bool)
        valid[-2:] = False

        pos_j, lab_j, ltrb_j = fcos_targets(
            jnp.asarray(points, jnp.float32),
            jnp.asarray(ranges, jnp.float32),
            jnp.asarray(gts), jnp.asarray(labels), jnp.asarray(valid))

        pos_n, lab_n, ltrb_n = _np_fcos_targets(
            points, ranges, gts[valid].astype(np.float64), labels[valid])

        np.testing.assert_array_equal(np.asarray(pos_j), pos_n)
        np.testing.assert_array_equal(np.asarray(lab_j)[pos_n],
                                      lab_n[pos_n])
        np.testing.assert_allclose(np.asarray(ltrb_j)[pos_n],
                                   ltrb_n[pos_n], rtol=1e-4, atol=1e-3)

    def test_centerness_formula(self):
        # centerness = sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b)))
        # center point -> 1.0; edge point -> ~0 (fcos_head.py:302-315)
        gts = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
        labels = jnp.asarray([1], jnp.int32)
        valid = jnp.asarray([True])
        points = jnp.asarray([[32.0, 32.0], [4.0, 32.0]], jnp.float32)
        ranges = jnp.asarray([[-1.0, 1e8], [-1.0, 1e8]], jnp.float32)
        pos, _, ltrb = fcos_targets(points, ranges, gts, labels, valid)
        assert bool(pos.all())
        l, t, r, b = [np.asarray(ltrb)[:, i] for i in range(4)]
        ctr = np.sqrt((np.minimum(l, r) / np.maximum(l, r))
                      * (np.minimum(t, b) / np.maximum(t, b)))
        np.testing.assert_allclose(ctr[0], 1.0, atol=1e-6)
        np.testing.assert_allclose(ctr[1], np.sqrt(4.0 / 60.0), atol=1e-6)


class TestYoloTargets:
    def _one_level(self, gts, labels, valid, num_classes=4):
        """Run yolo_loss on a single level with crafted logits and recover
        the positive mask/targets through loss gradients is indirect;
        instead re-derive the scatter from the documented contract and
        check the loss responds exactly to it."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            YOLO_ANCHORS, YOLO_STRIDES, yolo_loss,
        )
        return YOLO_ANCHORS, YOLO_STRIDES, yolo_loss

    def test_perfect_prediction_zeroes_xy_wh_loss(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            YOLO_ANCHORS, YOLO_STRIDES, yolo_loss,
        )
        num_classes = 4
        rs = np.random.RandomState(0)
        # one gt per level region; center chosen off-cell-center so tx/ty
        # offsets are non-trivial
        gts = np.asarray([[100.0, 120.0, 260.0, 280.0]], np.float32)
        labels = np.asarray([2], np.int32)
        valid = np.asarray([True])

        level_preds = []
        for anchors, stride in zip(YOLO_ANCHORS, YOLO_STRIDES):
            h = w = 416 // stride
            p = np.zeros((h, w, 3 * (5 + num_classes)), np.float32)
            level_preds.append(p)

        # compute the documented targets with a numpy loop and write the
        # exact inverse-sigmoid/log values into the predictions
        gx, gy = 180.0, 200.0
        gw, gh = 160.0, 160.0
        for li, (anchors, stride) in enumerate(zip(YOLO_ANCHORS, YOLO_STRIDES)):
            aw = np.asarray([a[0] for a in anchors])
            ah = np.asarray([a[1] for a in anchors])
            inter = np.minimum(gw, aw) * np.minimum(gh, ah)
            union = gw * gh + aw * ah - inter
            best = int(np.argmax(inter / union))
            ci = int(gx / stride)
            cj = int(gy / stride)
            txy = np.asarray([gx / stride - ci, gy / stride - cj])
            txy = np.clip(txy, 1e-4, 1 - 1e-4)
            p = level_preds[li].reshape(-1, 3, 5 + num_classes)
            idx = cj * (416 // stride) + ci
            p[idx, best, 0:2] = np.log(txy / (1 - txy))  # inv sigmoid
            p[idx, best, 2] = np.log(gw / aw[best])
            p[idx, best, 3] = np.log(gh / ah[best])

        out = yolo_loss([jnp.asarray(p) for p in level_preds],
                        jnp.asarray(gts), jnp.asarray(labels),
                        jnp.asarray(valid), num_classes)
        # xy uses sigmoid BCE (mmdet loss_xy CrossEntropyLoss(use_sigmoid)):
        # the crafted logit z = logit(clip(txy)) against the TRUE (unclipped)
        # target leaves exactly BCE(z, txy), summed over levels
        # (num_pos == 1 per level)
        want_xy = 0.0
        for li, stride in enumerate(YOLO_STRIDES):
            t = np.asarray([gx / stride - int(gx / stride),
                            gy / stride - int(gy / stride)])
            tc = np.clip(t, 1e-4, 1 - 1e-4)
            z = np.log(tc / (1 - tc))
            want_xy += float(np.sum(
                np.maximum(z, 0) - z * t + np.log1p(np.exp(-np.abs(z)))))
        np.testing.assert_allclose(float(out.loss_xy), want_xy, rtol=1e-4)
        assert float(out.loss_wh) < 1e-9

    def test_high_iou_anchors_leave_negative_set(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            yolo_loss,
        )
        num_classes = 4
        gts = jnp.asarray([[100.0, 120.0, 260.0, 280.0]], jnp.float32)
        labels = jnp.asarray([2], jnp.int32)
        valid_t = jnp.asarray([True])
        valid_f = jnp.asarray([False])

        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            YOLO_STRIDES,
        )
        preds = [jnp.zeros((416 // s, 416 // s, 3 * (5 + num_classes)),
                           jnp.float32) for s in YOLO_STRIDES]
        # with the gt invalid every anchor is negative -> conf loss strictly
        # larger than with the gt valid (positives+excluded band shrink it
        # by less than the positive term adds, so compare the negative-only
        # component: all-zero logits give identical per-anchor BCE, so the
        # count difference shows up directly)
        out_t = yolo_loss(preds, gts, labels, valid_t, num_classes)
        out_f = yolo_loss(preds, gts, labels, valid_f, num_classes)
        assert np.isfinite(float(out_t.loss_conf))
        assert np.isfinite(float(out_f.loss_conf))
        assert float(out_t.loss_conf) != float(out_f.loss_conf)
