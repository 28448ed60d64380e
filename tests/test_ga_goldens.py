"""Guided-Anchoring target goldens.

Independent numpy transcriptions of the reference algorithms, checked
exactly against the jax implementations:

- ``ga_loc_targets``: mmdetection/mmdet/models/dense_heads/
  guided_anchor_head.py:376-476 (sequential per-gt center/ignore region
  writes, adjacent-level ignore maps, 0.1 negative weight, avg factor
  total_cells/200) with calc_region (mmdet/core/anchor/utils.py:49-71).
- ApproxMaxIoU shape assignment: mmdet/core/bbox/assigners/
  approx_max_iou_assigner.py:121-139 (per-square max over the octave's 9
  approx anchors, then MaxIoU assign_wrt_overlaps with the ga_assigner
  thresholds pos .5 / neg .4 / min_pos .4) over a numpy transcription of
  AnchorGenerator (mmdet/core/anchor/anchor_generator.py: scale-major base
  anchors, center_offset 0, grid shifts x*stride).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
    guided_anchor_head as GA,
)

STRIDES = (8, 16, 32, 64, 128)
FEATMAP_SIZES = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]


# ---------------------------------------------------------------------------
# numpy transcriptions
# ---------------------------------------------------------------------------


def np_calc_region(bbox, ratio, featmap_size):
    x1 = int(np.clip(np.round((1 - ratio) * bbox[0] + ratio * bbox[2]), 0,
                     featmap_size[1]))
    y1 = int(np.clip(np.round((1 - ratio) * bbox[1] + ratio * bbox[3]), 0,
                     featmap_size[0]))
    x2 = int(np.clip(np.round(ratio * bbox[0] + (1 - ratio) * bbox[2]), 0,
                     featmap_size[1]))
    y2 = int(np.clip(np.round(ratio * bbox[1] + (1 - ratio) * bbox[3]), 0,
                     featmap_size[0]))
    return x1, y1, x2, y2


def np_ga_loc_targets(gt_bboxes, featmap_sizes, strides=STRIDES,
                      octave_base_scale=4, center_ratio=0.2,
                      ignore_ratio=0.5):
    num_lvls = len(featmap_sizes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    ts = [np.zeros((h, w), np.float32) for h, w in featmap_sizes]
    ws = [np.full((h, w), -1.0, np.float32) for h, w in featmap_sizes]
    ims = [np.zeros((h, w), np.float32) for h, w in featmap_sizes]
    scale = np.sqrt((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                    * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
    min_anchor_size = np.float32(octave_base_scale * strides[0])
    target_lvls = np.clip(
        np.floor(np.log2(scale) - np.log2(min_anchor_size) + 0.5),
        0, num_lvls - 1).astype(int)
    for g in range(gt_bboxes.shape[0]):
        lvl = target_lvls[g]
        gt_ = gt_bboxes[g] / strides[lvl]
        ix1, iy1, ix2, iy2 = np_calc_region(gt_, r2, featmap_sizes[lvl])
        cx1, cy1, cx2, cy2 = np_calc_region(gt_, r1, featmap_sizes[lvl])
        ts[lvl][cy1:cy2 + 1, cx1:cx2 + 1] = 1
        ws[lvl][iy1:iy2 + 1, ix1:ix2 + 1] = 0
        ws[lvl][cy1:cy2 + 1, cx1:cx2 + 1] = 1
        if lvl > 0:
            gt_ = gt_bboxes[g] / strides[lvl - 1]
            x1, y1, x2, y2 = np_calc_region(gt_, r2, featmap_sizes[lvl - 1])
            ims[lvl - 1][y1:y2 + 1, x1:x2 + 1] = 1
        if lvl < num_lvls - 1:
            gt_ = gt_bboxes[g] / strides[lvl + 1]
            x1, y1, x2, y2 = np_calc_region(gt_, r2, featmap_sizes[lvl + 1])
            ims[lvl + 1][y1:y2 + 1, x1:x2 + 1] = 1
    for lv in range(num_lvls):
        ws[lv][(ws[lv] < 0) & (ims[lv] > 0)] = 0
        ws[lv][ws[lv] < 0] = 0.1
    avg = sum(h * w for h, w in featmap_sizes) / 200.0
    return ts, ws, avg


def np_anchor_grid(featmap_sizes, strides, scales, ratios):
    """mmdet AnchorGenerator transcription: scale-major base anchors centered
    at 0 (center_offset=0), grid-shifted by x*stride; per-cell contiguous."""
    out = []
    for (h, w), stride in zip(featmap_sizes, strides):
        base = float(stride)
        h_ratios = np.sqrt(np.asarray(ratios, np.float32))
        w_ratios = 1.0 / h_ratios
        ws = (base * w_ratios[:, None] * np.asarray(scales)[None, :]).reshape(-1)
        hs = (base * h_ratios[:, None] * np.asarray(scales)[None, :]).reshape(-1)
        basea = np.stack([-0.5 * ws, -0.5 * hs, 0.5 * ws, 0.5 * hs], -1)
        sx = np.arange(w, dtype=np.float32) * stride
        sy = np.arange(h, dtype=np.float32) * stride
        mx, my = np.meshgrid(sx, sy)
        shifts = np.stack([mx.ravel(), my.ravel(), mx.ravel(), my.ravel()], -1)
        out.append((basea[None] + shifts[:, None]).reshape(-1, 4))
    return np.concatenate(out).astype(np.float32)


def np_iou(a, b):
    """mmdet BboxOverlaps2D (no +1)."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-12)


def np_assign_wrt_overlaps(overlaps, pos_thr, neg_thr, min_pos_iou,
                           gt_max_assign_all=True):
    """mmdet MaxIoUAssigner.assign_wrt_overlaps (max_iou_assigner.py:139+):
    overlaps [G, N] -> assigned_gt_inds [N] (-1 unassigned, 0 neg, g+1 pos)."""
    G, N = overlaps.shape
    assigned = np.full(N, -1, np.int64)
    max_overlaps = overlaps.max(0)
    argmax = overlaps.argmax(0)
    assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax[pos] + 1
    gt_max = overlaps.max(1)
    for g in range(G):
        if gt_max[g] >= min_pos_iou:
            if gt_max_assign_all:
                assigned[overlaps[g] == gt_max[g]] = g + 1
            else:
                assigned[overlaps[g].argmax()] = g + 1
    return assigned


def np_ga_shape_assign(gts, featmap_sizes, strides=STRIDES):
    octave = 4 * 2.0 ** (np.arange(3) / 3.0)
    approxs = np_anchor_grid(featmap_sizes, strides, octave, (0.5, 1.0, 2.0))
    A = approxs.shape[0] // 9
    iou = np_iou(approxs, gts)  # [A*9, G]
    collapsed = iou.reshape(A, 9, -1).max(1).T  # [G, A]
    return np_assign_wrt_overlaps(collapsed, 0.5, 0.4, 0.4), collapsed


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def rand_gts(rng, n):
    # log-uniform sizes 8..600 so every pyramid level receives gts
    wlog = rng.uniform(np.log(8), np.log(600), size=(n, 2))
    wh = np.exp(wlog).astype(np.float32)
    cx = rng.uniform(0, 160, size=n).astype(np.float32)
    cy = rng.uniform(0, 128, size=n).astype(np.float32)
    return np.stack([cx - wh[:, 0] / 2, cy - wh[:, 1] / 2,
                     cx + wh[:, 0] / 2, cy + wh[:, 1] / 2], -1)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ga_loc_targets_golden(seed):
    rng = np.random.RandomState(seed)
    gts = rand_gts(rng, 6)
    ts, ws, avg = np_ga_loc_targets(gts, FEATMAP_SIZES)

    pairs, javg = GA.ga_loc_targets(
        jnp.asarray(gts), jnp.ones(6, bool), FEATMAP_SIZES)
    assert np.isclose(javg, avg)
    total_pos = 0
    for (jt, jw), t, w in zip(pairs, ts, ws):
        np.testing.assert_array_equal(np.asarray(jt), t)
        np.testing.assert_array_equal(np.asarray(jw), w)
        total_pos += t.sum()
    assert total_pos > 0  # fixture actually exercises positives


def test_ga_loc_targets_padded_gt_invariance():
    rng = np.random.RandomState(3)
    gts = rand_gts(rng, 4)
    padded = np.concatenate([gts, np.zeros((4, 4), np.float32)])
    valid = np.concatenate([np.ones(4, bool), np.zeros(4, bool)])
    a, _ = GA.ga_loc_targets(jnp.asarray(gts), jnp.ones(4, bool),
                             FEATMAP_SIZES)
    b, _ = GA.ga_loc_targets(jnp.asarray(padded), jnp.asarray(valid),
                             FEATMAP_SIZES)
    for (ta, wa), (tb, wb) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))


def test_ga_loc_sequential_overwrite_semantics():
    # A later gt's ignore ring must zero an earlier gt's center weight
    # (the reference's in-order writes), and a later-still center re-wins.
    g0 = np.asarray([[16.0, 16.0, 48.0, 48.0],   # level 0, scale 32
                     [12.0, 12.0, 52.0, 52.0]], np.float32)  # overlapping
    pairs, _ = GA.ga_loc_targets(jnp.asarray(g0), jnp.ones(2, bool),
                                 FEATMAP_SIZES)
    ts, ws, _ = np_ga_loc_targets(g0, FEATMAP_SIZES)
    np.testing.assert_array_equal(np.asarray(pairs[0][1]), ws[0])
    np.testing.assert_array_equal(np.asarray(pairs[0][0]), ts[0])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ga_approx_overlaps_and_assign_golden(seed):
    rng = np.random.RandomState(seed + 10)
    gts = rand_gts(rng, 5)
    np_assigned, np_collapsed = np_ga_shape_assign(gts, FEATMAP_SIZES)

    j_collapsed = GA.ga_approx_overlaps(jnp.asarray(gts), FEATMAP_SIZES)
    np.testing.assert_allclose(np.asarray(j_collapsed), np_collapsed,
                               rtol=1e-5, atol=1e-6)

    res = GA.ga_shape_assign(jnp.asarray(gts), jnp.zeros(5, jnp.int32),
                             jnp.ones(5, bool), FEATMAP_SIZES)
    np.testing.assert_array_equal(np.asarray(res.assigned_gt_inds),
                                  np_assigned)
    assert (np_assigned > 0).sum() > 0


def test_ga_squares_match_numpy_generator():
    sq = GA.ga_squares(FEATMAP_SIZES)
    ref = np_anchor_grid(FEATMAP_SIZES, STRIDES, (4.0,), (1.0,))
    np.testing.assert_allclose(sq, ref, rtol=1e-6)


@pytest.mark.slow
def test_ga_retina_loss_shape_branch_descends():
    """Setting the shape pred to the exact log(gt/square) ratio at positive
    squares must lower loss_shape vs zeros."""
    rng = np.random.RandomState(0)
    gts = rand_gts(rng, 4)
    gt_boxes = jnp.asarray(gts)
    gt_valid = jnp.ones(4, bool)
    res = GA.ga_shape_assign(gt_boxes, jnp.zeros(4, jnp.int32), gt_valid,
                             FEATMAP_SIZES)
    squares = jnp.asarray(GA.ga_squares(FEATMAP_SIZES))
    matched = gt_boxes[jnp.clip(res.assigned_gt_inds - 1, 0, 3)]
    sw = squares[:, 2] - squares[:, 0]
    sh = squares[:, 3] - squares[:, 1]
    ideal = jnp.stack([
        jnp.log(jnp.maximum(matched[:, 2] - matched[:, 0], 1e-3) / sw),
        jnp.log(jnp.maximum(matched[:, 3] - matched[:, 1], 1e-3) / sh),
    ], -1)

    def loss_with(shape_flat):
        # rebuild per-level outs with zeros for cls/reg/loc
        outs = []
        start = 0
        for (h, w) in FEATMAP_SIZES:
            n = h * w
            outs.append((jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 4)),
                         shape_flat[start:start + n].reshape(1, h, w, 2),
                         jnp.zeros((1, h, w, 1))))
            start += n
        ls = GA.ga_retina_loss(outs, gt_boxes, jnp.zeros(4, jnp.int32),
                               gt_valid, (128.0, 160.0), 3)
        return float(ls.loss_shape)

    l_zero = loss_with(jnp.zeros((squares.shape[0], 2)))
    l_ideal = loss_with(ideal)
    # The shape branch only controls (w, h): the ideal log-ratio zeroes the
    # two size terms of the bounded-IoU loss, leaving just the center-offset
    # terms it cannot affect — a strict, substantial descent.
    assert l_ideal < l_zero * 0.9
