"""Randomized goldens for the most load-bearing assignment/target logic.

Each test compares the JAX static-shape implementation against an
*independent numpy transcription* of the reference algorithm (written from
the published mmdet semantics, operating on dynamic-size valid subsets the
way the PyTorch originals do):

- MaxIoUAssigner (mmdetection/mmdet/core/bbox/assigners/max_iou_assigner.py:10)
  — used by FasterRCNN/RPN/RetinaNet/SSD/MaskRCNN/... — both
  ``gt_max_assign_all`` modes, over random box clouds.
- FoveaBox per-level target assignment
  (mmdetection/mmdet/models/dense_heads/fovea_head.py:195-260) — fovea
  region ceil/floor arithmetic, scale-range gating, smallest-area-wins
  overlap resolution, log-space ltrb targets.
- PISA ISR-P reweighting (mmdetection/mmdet/models/losses/pisa_loss.py:12
  isr_p) — within-class IoU ranking, (bias + (1-bias)*hlr)^k, positive-mass
  renormalization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import max_iou_assign


def _np_iou(a, b):
    """[A,4],[B,4] -> [A,B] IoU, plain numpy."""
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.clip(ix2 - ix1, 0, None)
    ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _np_max_iou_assign(ious, pos_thr, neg_thr, min_pos_iou,
                       gt_max_assign_all):
    """mmdet MaxIoUAssigner.assign_wrt_overlaps, numpy, valid gts only.

    ious: [G, N] (G = number of REAL gts). Returns assigned_gt_inds [N]
    with -1/0/k+1 encoding, indices into the valid-gt list.
    """
    g, n = ious.shape
    assigned = np.full(n, -1, np.int64)
    max_o = ious.max(axis=0)
    arg_o = ious.argmax(axis=0)
    assigned[(max_o >= 0) & (max_o < neg_thr)] = 0
    p = max_o >= pos_thr
    assigned[p] = arg_o[p] + 1
    gt_max = ious.max(axis=1)
    gt_arg = ious.argmax(axis=1)
    for i in range(g):  # ascending order: later gts override earlier
        if gt_max[i] >= min_pos_iou:
            if gt_max_assign_all:
                assigned[ious[i] == gt_max[i]] = i + 1
            else:
                assigned[gt_arg[i]] = i + 1
    return assigned


def _random_boxes(rs, n, span=200.0, min_sz=4.0, max_sz=80.0):
    cx = rs.uniform(0, span, n)
    cy = rs.uniform(0, span, n)
    w = rs.uniform(min_sz, max_sz, n)
    h = rs.uniform(min_sz, max_sz, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    axis=-1).astype(np.float32)


class TestMaxIoUAssignGolden:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("gt_max_assign_all", [True, False])
    @pytest.mark.parametrize(
        "thrs", [(0.7, 0.3, 0.3), (0.5, 0.4, 0.2), (0.5, 0.5, 0.33)]
    )
    def test_matches_numpy_transcription(self, seed, gt_max_assign_all, thrs):
        pos_thr, neg_thr, min_pos_iou = thrs
        rs = np.random.RandomState(seed)
        n, g_pad = 96, 8
        boxes = _random_boxes(rs, n)
        gts = _random_boxes(rs, g_pad, span=180.0, min_sz=8.0, max_sz=90.0)
        labels = rs.randint(0, 5, g_pad).astype(np.int32)
        valid = np.zeros(g_pad, bool)
        valid[: rs.randint(2, g_pad)] = True  # contiguous padding tail

        res = max_iou_assign(
            jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray(labels),
            jnp.asarray(valid), pos_thr, neg_thr, min_pos_iou=min_pos_iou,
            gt_max_assign_all=gt_max_assign_all,
        )
        got = np.asarray(res.assigned_gt_inds)

        vidx = np.where(valid)[0]
        ious = _np_iou(gts[vidx], boxes)
        want_sub = _np_max_iou_assign(ious, pos_thr, neg_thr, min_pos_iou,
                                      gt_max_assign_all)
        # map valid-subset indices back to padded gt indices
        want = np.where(want_sub > 0, vidx[np.clip(want_sub - 1, 0, None)] + 1,
                        want_sub)
        np.testing.assert_array_equal(got, want)

        want_labels = np.where(want > 0,
                               labels[np.clip(want - 1, 0, None)], -1)
        np.testing.assert_array_equal(np.asarray(res.labels), want_labels)

    def test_box_valid_mask_excludes_outside_anchors(self):
        rs = np.random.RandomState(7)
        boxes = _random_boxes(rs, 48)
        gts = _random_boxes(rs, 4)
        labels = np.arange(4, dtype=np.int32)
        valid = np.ones(4, bool)
        box_valid = rs.rand(48) > 0.3

        res = max_iou_assign(
            jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray(labels),
            jnp.asarray(valid), 0.5, 0.4, min_pos_iou=0.2,
            box_valid=jnp.asarray(box_valid),
        )
        got = np.asarray(res.assigned_gt_inds)
        # invalid boxes behave as if absent: transcription on the subset
        sub = np.where(box_valid)[0]
        ious = _np_iou(gts, boxes[sub])
        want_sub = _np_max_iou_assign(ious, 0.5, 0.4, 0.2, True)
        np.testing.assert_array_equal(got[sub], want_sub)
        assert (got[~box_valid] <= 0).all()  # never positive


def _np_fovea_targets(h, w, stride, base_len, scale_range, gts, labels,
                      num_classes, sigma=0.4):
    """mmdet FoveaHead._get_target_single, numpy, one level.

    Larger-area gts are written FIRST so smaller ones overwrite
    (fovea_head.py:217-226 sorts by area descending).
    """
    lab = np.full(h * w, num_classes, np.int64)
    tgt = np.zeros((h * w, 4), np.float64)
    pos = np.zeros(h * w, bool)
    xs = (np.arange(w) + 0.5) * stride
    ys = (np.arange(h) + 0.5) * stride
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    px, py = gx.reshape(-1), gy.reshape(-1)

    areas = np.sqrt((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))
    order = np.argsort(-areas)  # descending: smallest written last, wins
    for i in order:
        a = areas[i]
        if not (scale_range[0] <= a <= scale_range[1]):
            continue
        x1, y1, x2, y2 = gts[i] / stride
        hw, hh = 0.5 * (x2 - x1), 0.5 * (y2 - y1)
        left = int(np.clip(np.ceil(x1 + (1 - sigma) * hw - 0.5), 0, w - 1))
        right = int(np.clip(np.floor(x1 + (1 + sigma) * hw - 0.5), 0, w - 1))
        top = int(np.clip(np.ceil(y1 + (1 - sigma) * hh - 0.5), 0, h - 1))
        down = int(np.clip(np.floor(y1 + (1 + sigma) * hh - 0.5), 0, h - 1))
        cell = np.zeros((h, w), bool)
        cell[top:down + 1, left:right + 1] = True
        m = cell.reshape(-1)
        lab[m] = labels[i]
        pos[m] = True
        t = np.stack([
            (px[m] - gts[i, 0]) / base_len,
            (py[m] - gts[i, 1]) / base_len,
            (gts[i, 2] - px[m]) / base_len,
            (gts[i, 3] - py[m]) / base_len,
        ], axis=-1)
        tgt[m] = np.log(np.clip(t, 1.0 / 16, 16.0))
    return lab, tgt, pos


class TestFoveaTargetGolden:
    @pytest.mark.parametrize("seed", [0, 3, 11])
    def test_matches_numpy_transcription(self, seed):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fovea_head import (
            fovea_targets_level,
        )

        rs = np.random.RandomState(seed)
        h, w, stride, base_len, scale_range = 20, 24, 16, 32, (16.0, 64.0)
        g_pad = 6
        # sqrt-areas straddling the scale range so gating is exercised
        gts = _random_boxes(rs, g_pad, span=stride * 18, min_sz=10.0,
                            max_sz=90.0)
        labels = rs.randint(0, 7, g_pad).astype(np.int32)
        valid = np.ones(g_pad, bool)
        valid[-2:] = rs.rand(2) > 0.5

        lab_j, tgt_j, pos_j = fovea_targets_level(
            h, w, stride, base_len, scale_range, jnp.asarray(gts),
            jnp.asarray(labels), jnp.asarray(valid), num_classes=7)

        lab_n, tgt_n, pos_n = _np_fovea_targets(
            h, w, stride, base_len, scale_range, gts[valid], labels[valid],
            num_classes=7)

        np.testing.assert_array_equal(np.asarray(pos_j), pos_n)
        np.testing.assert_array_equal(np.asarray(lab_j), lab_n)
        # targets only meaningful at positive cells (loss masks the rest)
        np.testing.assert_allclose(
            np.asarray(tgt_j)[pos_n], tgt_n[pos_n], rtol=1e-5, atol=1e-5)

    def test_scale_gate_excludes_out_of_range_gt(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fovea_head import (
            fovea_targets_level,
        )

        # one huge gt, sqrt(area)=200 > upper=64 -> level stays all-negative
        gts = jnp.asarray([[0.0, 0.0, 200.0, 200.0]])
        lab, _, pos = fovea_targets_level(
            16, 16, 16, 32, (16.0, 64.0), gts, jnp.asarray([2]),
            jnp.asarray([True]), num_classes=7)
        assert not bool(pos.any())
        assert (np.asarray(lab) == 7).all()


def _np_isr_p(labels, ious, pos, num_classes, bias=0.0, k=2.0):
    """mmdet pisa_loss.isr_p weighting, numpy per-class loop."""
    n = labels.shape[0]
    w = np.ones(n, np.float64)
    for c in range(num_classes):
        idx = np.where(pos & (labels == c))[0]
        if idx.size == 0:
            continue
        order = np.argsort(-ious[idx])  # descending iou
        ranks = np.empty(idx.size, np.float64)
        ranks[order] = np.arange(idx.size)
        hlr = 1.0 - ranks / idx.size
        w[idx] = (bias + (1 - bias) * hlr) ** k
    npos = max(pos.sum(), 1)
    tot = w[pos].sum()
    w[pos] *= npos / max(tot, 1e-6)
    w[~pos] = 1.0
    return w


class TestISRPGolden:
    @pytest.mark.parametrize("seed", [0, 5])
    @pytest.mark.parametrize("bias,k", [(0.0, 2.0), (0.2, 1.0)])
    def test_matches_numpy_transcription(self, seed, bias, k):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.pisa_nasfcos import (
            isr_p_weights,
        )

        rs = np.random.RandomState(seed)
        n, c = 64, 5
        labels = rs.randint(0, c, n).astype(np.int32)
        ious = rs.uniform(0.05, 0.95, n).astype(np.float32)  # distinct
        pos = rs.rand(n) > 0.6

        got = np.asarray(isr_p_weights(
            jnp.asarray(labels), jnp.asarray(ious), jnp.asarray(pos), c,
            bias=bias, k=k))
        want = _np_isr_p(labels, ious.astype(np.float64), pos, c,
                         bias=bias, k=k)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_higher_iou_gets_higher_weight_within_class(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.pisa_nasfcos import (
            isr_p_weights,
        )

        labels = jnp.asarray([1, 1, 1, 2, 2], jnp.int32)
        ious = jnp.asarray([0.9, 0.5, 0.7, 0.6, 0.8], jnp.float32)
        pos = jnp.ones(5, bool)
        w = np.asarray(isr_p_weights(labels, ious, pos, 4))
        assert w[0] > w[2] > w[1]   # class 1 ranking
        assert w[4] > w[3]          # class 2 ranking
        # positive mass preserved
        np.testing.assert_allclose(w.sum(), 5.0, rtol=1e-5)
