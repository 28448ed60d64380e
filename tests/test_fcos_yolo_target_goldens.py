"""Goldens for FCOS point assignment and YOLOv3 grid-cell targets.

- FCOS: independent numpy transcription of mmdet's
  FCOSHead.get_targets/_get_target_single without center sampling
  (mmdetection/mmdet/models/dense_heads/fcos_head.py:221-300) — per-point
  candidate gts by inside-box + regress-range on max(ltrb), min-area wins;
  centerness target formula (fcos_head.py:302-315).
- YOLOv3: independent numpy transcription of the full GridAssigner
  (mmdet/core/bbox/assigners/grid_assigner.py:42-156) + YOLOBBoxCoder
  targets + the config's unnormalized sum losses (weights 1/1/2/2) —
  full expected-loss equality on random fixtures.
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
    @staticmethod
    def _np_yolo_loss(level_preds, gts, labels, valid, num_classes,
                      pos_thr=0.5, neg_thr=0.5, min_pos_iou=0.0):
        """Numpy transcription: GridAssigner over the concatenated levels
        (anchors at cell centers, responsible = gt-center cells), YOLO coder
        targets, sum losses."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            YOLO_ANCHORS, YOLO_STRIDES)

        anchors, resp, strides, preds = [], [], [], []
        for pred, ancs, s in zip(level_preds, YOLO_ANCHORS, YOLO_STRIDES):
            h, w = pred.shape[0], pred.shape[1]
            preds.append(np.asarray(pred).reshape(h, w, 3, -1).reshape(
                -1, 5 + num_classes))
            for j in range(h):
                for i in range(w):
                    cell_resp = False
                    for g in range(gts.shape[0]):
                        if not valid[g]:
                            continue
                        gcx = (gts[g, 0] + gts[g, 2]) / 2
                        gcy = (gts[g, 1] + gts[g, 3]) / 2
                        if (int(np.floor(gcx / s)) == i
                                and int(np.floor(gcy / s)) == j):
                            cell_resp = True
                    for (aw, ah) in ancs:
                        cx, cy = (i + 0.5) * s, (j + 0.5) * s
                        anchors.append([cx - aw / 2, cy - ah / 2,
                                        cx + aw / 2, cy + ah / 2])
                        resp.append(cell_resp)
                        strides.append(s)
        anchors = np.asarray(anchors, np.float64)
        resp = np.asarray(resp)
        strides = np.asarray(strides, np.float64)
        preds = np.concatenate(preds).astype(np.float64)
        A, G = anchors.shape[0], gts.shape[0]

        def iou(a, b):
            ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
            iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
            ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
            iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
            inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
            aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
            bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            return inter / np.maximum(aa[:, None] + bb[None, :] - inter, 1e-6)

        ov = iou(np.asarray(gts, np.float64), anchors)  # [G, A]
        ov_valid = np.where(np.asarray(valid)[:, None], ov, 0.0)
        assigned = np.full(A, -1, np.int64)
        max_all = ov_valid.max(0) if G else np.zeros(A)
        assigned[max_all <= neg_thr] = 0
        ov_r = np.where(np.asarray(valid)[:, None] & resp[None, :], ov, -1.0)
        max_r, arg_r = ov_r.max(0), ov_r.argmax(0)
        sel = (max_r > pos_thr) & resp
        assigned[sel] = arg_r[sel] + 1
        for g in range(G):
            gm = ov_r[g].max()
            if gm > min_pos_iou:
                assigned[(ov_r[g] == gm)] = g + 1

        pos = assigned > 0
        neg = assigned == 0
        best = np.clip(assigned - 1, 0, max(G - 1, 0))
        acx = (anchors[:, 0] + anchors[:, 2]) / 2
        acy = (anchors[:, 1] + anchors[:, 3]) / 2
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        gcx = (gts[:, 0] + gts[:, 2]) / 2
        gcy = (gts[:, 1] + gts[:, 3]) / 2
        gw = gts[:, 2] - gts[:, 0]
        gh = gts[:, 3] - gts[:, 1]
        eps = 1e-6
        tx = np.clip((gcx[best] - acx) / strides + 0.5, eps, 1 - eps)
        ty = np.clip((gcy[best] - acy) / strides + 0.5, eps, 1 - eps)
        tw = np.log(np.maximum(gw[best] / aw, eps))
        th = np.log(np.maximum(gh[best] / ah, eps))
        tcls = np.eye(num_classes)[np.clip(labels[best], 0, num_classes - 1)]

        def bce(z, t):
            return np.maximum(z, 0) - z * t + np.log1p(np.exp(-np.abs(z)))

        conf = np.sum(bce(preds[:, 4], pos.astype(np.float64)) * (pos | neg))
        xy = 2 * np.sum(bce(preds[:, 0:2], np.stack([tx, ty], -1))
                        * pos[:, None])
        wh = 2 * np.sum((preds[:, 2:4] - np.stack([tw, th], -1)) ** 2
                        * pos[:, None])
        cls = np.sum(bce(preds[:, 5:], tcls) * pos[:, None])
        return cls, conf, xy, wh

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_loss_matches_numpy_transcription(self, seed):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            YOLO_STRIDES, yolo_loss)

        rng = np.random.RandomState(seed)
        num_classes = 4
        level_preds = [
            rng.randn(160 // s, 160 // s, 3 * (5 + num_classes)).astype(
                np.float32) * 0.5
            for s in YOLO_STRIDES]
        G = 4
        cxcy = rng.uniform(10, 150, (G, 2))
        wh = np.exp(rng.uniform(np.log(16), np.log(140), (G, 2)))
        gts = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(
            np.float32)
        labels = rng.randint(0, num_classes, G).astype(np.int32)
        valid = rng.rand(G) > 0.2

        want = self._np_yolo_loss(level_preds, gts, labels, valid,
                                  num_classes)
        got = yolo_loss([jnp.asarray(p) for p in level_preds],
                        jnp.asarray(gts), jnp.asarray(labels),
                        jnp.asarray(valid), num_classes)
        for got_v, want_v, name in zip(
                [got.loss_cls, got.loss_conf, got.loss_xy, got.loss_wh],
                want, ["cls", "conf", "xy", "wh"]):
            np.testing.assert_allclose(float(got_v), want_v, rtol=2e-4,
                                       err_msg=name)

    def test_valid_vs_invalid_gt_changes_negative_set(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.yolov3 import (
            YOLO_STRIDES, yolo_loss,
        )
        num_classes = 4
        gts = jnp.asarray([[100.0, 120.0, 260.0, 280.0]], jnp.float32)
        labels = jnp.asarray([2], jnp.int32)

        preds = [jnp.zeros((416 // s, 416 // s, 3 * (5 + num_classes)),
                           jnp.float32) for s in YOLO_STRIDES]
        out_t = yolo_loss(preds, gts, labels, jnp.asarray([True]),
                          num_classes)
        out_f = yolo_loss(preds, gts, labels, jnp.asarray([False]),
                          num_classes)
        assert np.isfinite(float(out_t.loss_conf))
        assert np.isfinite(float(out_f.loss_conf))
        assert float(out_t.loss_conf) != float(out_f.loss_conf)
