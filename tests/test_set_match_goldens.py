"""Hungarian set-matching cost goldens for DETR and SparseRCNN.

Each cost matrix is compared against an *independent numpy transcription* of
mmdet's HungarianAssigner semantics
(mmdetection/mmdet/core/bbox/assigners/hungarian_assigner.py:115-125 +
mmdetection/mmdet/core/bbox/match_costs/match_cost.py):

- ClassificationCost (DETR): -softmax_prob[:, gt_label], weight 1.
- FocalLossCost (SparseRCNN): pos_cost - neg_cost over sigmoid probs with
  alpha=.25, gamma=2, eps=1e-12, weight 2.
- BBoxL1Cost (both, box_format='xyxy' default): L1 between the cxcywh->xyxy
  converted prediction and the image-size-normalized gt xyxy, weight 5.
- IoUCost giou mode: -GIoU on absolute xyxy, weight 2.

The GIoU algebra itself (detr._giou reconstructs the intersection from the
IoU rather than recomputing corners) is cross-checked against a direct
numpy hull-minus-union transcription, and the matched assignment returned by
the native C++ JV solver is checked to achieve scipy's optimal total cost on
the same matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.detr import (
    _giou,
    _hungarian_host,
    detr_cost,
    detr_loss,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.sparse_rcnn import (
    sparse_cost,
)


def _np_giou(a, b):
    """[N,4] x [M,4] xyxy -> GIoU, direct numpy (corner arithmetic)."""
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / np.maximum(union, 1e-12)
    hx1 = np.minimum(a[:, None, 0], b[None, :, 0])
    hy1 = np.minimum(a[:, None, 1], b[None, :, 1])
    hx2 = np.maximum(a[:, None, 2], b[None, :, 2])
    hy2 = np.maximum(a[:, None, 3], b[None, :, 3])
    hull = np.clip(hx2 - hx1, 0, None) * np.clip(hy2 - hy1, 0, None)
    return iou - (hull - union) / np.maximum(hull, 1e-6)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _fixture(seed, q=40, g=7, c=20, img=(240, 320)):
    rs = np.random.RandomState(seed)
    h, w = img
    logits = rs.randn(q, c + 1).astype(np.float32) * 2.0
    boxes_norm = 1.0 / (1.0 + np.exp(-rs.randn(q, 4).astype(np.float32)))
    gcx = rs.uniform(30, w - 30, g)
    gcy = rs.uniform(30, h - 30, g)
    gw = rs.uniform(8, 60, g)
    gh = rs.uniform(8, 60, g)
    gt = np.stack([gcx - gw / 2, gcy - gh / 2, gcx + gw / 2, gcy + gh / 2],
                  -1).astype(np.float32)
    labels = rs.randint(0, c, g).astype(np.int32)
    return logits, boxes_norm, gt, labels, (h, w)


class TestGIoUAlgebra:
    """detr._giou reconstructs inter from IoU; check vs direct corners."""

    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_direct_formula(self, seed):
        rs = np.random.RandomState(seed)
        a = np.sort(rs.uniform(0, 200, (25, 4)).astype(np.float32), -1)
        b = np.sort(rs.uniform(0, 200, (13, 4)).astype(np.float32), -1)
        a = a[:, [0, 1, 3, 2]][:, [0, 1, 2, 3]]
        a = np.stack([a[:, 0], a[:, 1], a[:, 0] + a[:, 2] + 1,
                      a[:, 1] + a[:, 3] + 1], -1)
        b = np.stack([b[:, 0], b[:, 1], b[:, 0] + b[:, 2] + 1,
                      b[:, 1] + b[:, 3] + 1], -1)
        got = np.asarray(_giou(jnp.asarray(a), jnp.asarray(b)))
        want = _np_giou(a, b)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestDETRCostGolden:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_cost_matrix_matches_mmdet_transcription(self, seed):
        logits, boxes_norm, gt, labels, (h, w) = _fixture(seed)
        c = 20
        valid = np.ones(gt.shape[0], bool)

        cost, _, _ = detr_cost(
            jnp.asarray(logits), jnp.asarray(boxes_norm), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid), (h, w), c)
        cost = np.asarray(cost)

        # --- independent transcription (hungarian_assigner.py:115-125) ---
        factor = np.array([w, h, w, h], np.float32)
        probs = _softmax(logits)
        cls_cost = -probs[:, labels]                        # weight 1
        pred_xyxy_norm = _cxcywh_to_xyxy(boxes_norm)
        reg_cost = np.abs(
            pred_xyxy_norm[:, None] - (gt / factor)[None]).sum(-1)  # w 5
        iou_cost = -_np_giou(pred_xyxy_norm * factor, gt)   # weight 2
        want = cls_cost + 5.0 * reg_cost + 2.0 * iou_cost
        np.testing.assert_allclose(cost, want, rtol=1e-4, atol=1e-4)

    def test_invalid_gt_column_pinned(self):
        logits, boxes_norm, gt, labels, (h, w) = _fixture(4)
        valid = np.ones(gt.shape[0], bool)
        valid[-2:] = False
        cost, _, _ = detr_cost(
            jnp.asarray(logits), jnp.asarray(boxes_norm), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid), (h, w), 20)
        cost = np.asarray(cost)
        assert np.all(cost[:, -2:] == 1e6)
        assert np.all(cost[:, :-2] < 1e5)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_native_match_achieves_scipy_optimum(self, seed):
        logits, boxes_norm, gt, labels, (h, w) = _fixture(seed)
        valid = np.ones(gt.shape[0], bool)
        cost, _, _ = detr_cost(
            jnp.asarray(logits), jnp.asarray(boxes_norm), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid), (h, w), 20)
        cost = np.asarray(cost, np.float64)
        matched_q = _hungarian_host(cost)  # per-gt matched query
        assert np.all(matched_q >= 0)
        assert len(set(matched_q.tolist())) == gt.shape[0]  # one-to-one
        rows, cols = scipy_lsa(cost)
        got_total = cost[matched_q, np.arange(gt.shape[0])].sum()
        np.testing.assert_allclose(got_total, cost[rows, cols].sum(),
                                   rtol=1e-9)

    def test_perfect_predictions_zero_box_losses(self):
        """Queries placed exactly on the gts with peaked logits -> the
        Hungarian match must pick them and the box losses vanish."""
        _, _, gt, labels, (h, w) = _fixture(5, g=4)
        c = 20
        q = 12
        factor = np.array([w, h, w, h], np.float32)
        gt_norm = gt / factor
        boxes_norm = np.tile(np.array([[0.9, 0.9, 0.05, 0.05]], np.float32),
                             (q, 1))
        cxcywh = np.stack([
            (gt_norm[:, 0] + gt_norm[:, 2]) / 2,
            (gt_norm[:, 1] + gt_norm[:, 3]) / 2,
            gt_norm[:, 2] - gt_norm[:, 0],
            gt_norm[:, 3] - gt_norm[:, 1]], -1)
        boxes_norm[: gt.shape[0]] = cxcywh
        logits = np.zeros((q, c + 1), np.float32)
        logits[:, c] = 8.0  # background everywhere...
        for i, lab in enumerate(labels):
            logits[i] = 0.0
            logits[i, lab] = 12.0  # ...except the planted queries
        valid = np.ones(gt.shape[0], bool)
        out = detr_loss(
            jnp.asarray(logits), jnp.asarray(boxes_norm), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid), (h, w), c)
        assert float(out.loss_bbox) < 1e-5
        assert float(out.loss_giou) < 1e-4
        assert float(out.loss_cls) < 0.01


class TestSparseFocalCostGolden:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_cost_matrix_matches_mmdet_transcription(self, seed):
        rs = np.random.RandomState(seed)
        n, g, c = 30, 6, 15
        h, w = 200, 300
        logits = rs.randn(n, c).astype(np.float32) * 2.0
        cx = rs.uniform(20, w - 20, n)
        cy = rs.uniform(20, h - 20, n)
        bw = rs.uniform(10, 50, n)
        bh = rs.uniform(10, 50, n)
        boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                          cy + bh / 2], -1).astype(np.float32)
        gt = boxes[:g] + rs.uniform(-5, 5, (g, 4)).astype(np.float32)
        labels = rs.randint(0, c, g).astype(np.int32)
        valid = np.ones(g, bool)

        cost = np.asarray(sparse_cost(
            jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid), (h, w), c))

        # --- FocalLossCost transcription (match_cost.py) ---
        p = 1.0 / (1.0 + np.exp(-logits))
        eps, alpha, gamma = 1e-12, 0.25, 2.0
        neg = -np.log(1 - p + eps) * (1 - alpha) * p ** gamma
        pos = -np.log(p + eps) * alpha * (1 - p) ** gamma
        cls_cost = (pos - neg)[:, labels]
        factor = np.array([w, h, w, h], np.float32)
        reg_cost = np.abs(
            boxes[:, None] / factor - (gt / factor)[None]).sum(-1)
        iou_cost = -_np_giou(boxes, gt)
        want = 2.0 * cls_cost + 5.0 * reg_cost + 2.0 * iou_cost
        np.testing.assert_allclose(cost, want, rtol=1e-4, atol=1e-4)
