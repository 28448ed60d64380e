"""Goldens against the reference's OWN code (VERDICT r3 item 2).

Every earlier golden compared the repo against a hand-written numpy
transcription of the mmdet algorithm — which can encode the transcriber's
misreading on both sides.  These tests instead import the actual reference
modules from /root/reference/mmdetection via tests/ref_loader.py (a ~100
line fake-mmcv shim) and assert the repo's static-shape JAX implementations
produce IDENTICAL outputs on random fixtures:

- MaxIoUAssigner (max_iou_assigner.py:10) — both gt_max_assign_all modes,
  match_low_quality on/off, padded-gt equivalence.
- ATSSAssigner (atss_assigner.py:16) — multi-level candidate top-k,
  mean+std threshold, center-inside test.
- CenterRegionAssigner (center_region_assigner.py:71) — gt_inds + the
  shadowed (anchor, class) pair set.
- PointAssigner (point_assigner.py:9), RegionAssigner (region_assigner.py:36).
- DeltaXYWHBBoxCoder / TBLRBBoxCoder (coder/*.py) encode+decode.
- HungarianAssigner + match costs (hungarian_assigner.py:15,
  match_cost.py) for both the DETR and SparseRCNN cost configs,
  matched-pair equality via the native JV solver.
- RandomSampler (random_sampler.py:8) — deterministic saturation cases.
- eval_map (evaluation/mean_ap.py:267) — 'area' and VOC07 '11points'.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ref_loader import load

mmdet = load()

from lowlightenvironmentvideoobjectdetection_tpu.core import boxes as box_ops
from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import (
    AssignResult,
    center_region_assign,
    max_iou_assign,
    point_assign,
    random_sample_masks,
    region_assign,
)
from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
    eval_map as repo_eval_map,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.atss_head import (
    atss_assign,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fsaf_head import (
    _tblr_decode,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.detr import (
    detr_cost,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.sparse_rcnn import (
    sparse_cost,
)
from lowlightenvironmentvideoobjectdetection_tpu.ops.lap import (
    linear_sum_assignment as jv_lap,
)


def _rand_boxes(rs, n, span=256.0, min_sz=4.0, max_sz=96.0):
    cx = rs.uniform(max_sz / 2, span - max_sz / 2, n)
    cy = rs.uniform(max_sz / 2, span - max_sz / 2, n)
    w = rs.uniform(min_sz, max_sz, n)
    h = rs.uniform(min_sz, max_sz, n)
    return np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    ).astype(np.float32)


# ---------------------------------------------------------------- MaxIoU


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "gma,mlq", [(True, True), (False, True), (True, False)]
)
def test_max_iou_assigner_matches_reference(seed, gma, mlq):
    rs = np.random.RandomState(seed)
    bxs = _rand_boxes(rs, 128)
    gts = _rand_boxes(rs, 7)
    labels = rs.randint(0, 5, 7).astype(np.int64)

    ref = mmdet.assigners.max_iou_assigner.MaxIoUAssigner(
        pos_iou_thr=0.7,
        neg_iou_thr=0.3,
        min_pos_iou=0.3,
        gt_max_assign_all=gma,
        match_low_quality=mlq,
    )
    r = ref.assign(
        torch.from_numpy(bxs), torch.from_numpy(gts), None,
        torch.from_numpy(labels),
    )

    got = max_iou_assign(
        jnp.asarray(bxs), jnp.asarray(gts), jnp.asarray(labels, jnp.int32),
        jnp.ones(7, bool), 0.7, 0.3, 0.3,
        match_low_quality=mlq, gt_max_assign_all=gma,
    )
    np.testing.assert_array_equal(
        np.asarray(got.assigned_gt_inds), r.gt_inds.numpy()
    )
    np.testing.assert_array_equal(np.asarray(got.labels), r.labels.numpy())
    np.testing.assert_allclose(
        np.asarray(got.max_overlaps), r.max_overlaps.numpy(), rtol=1e-5
    )


def test_max_iou_padded_gts_match_reference_valid_subset():
    rs = np.random.RandomState(7)
    bxs = _rand_boxes(rs, 96)
    gts = _rand_boxes(rs, 5)
    labels = rs.randint(0, 5, 5).astype(np.int64)

    ref = mmdet.assigners.max_iou_assigner.MaxIoUAssigner(0.5, 0.4, min_pos_iou=0.2)
    r = ref.assign(
        torch.from_numpy(bxs), torch.from_numpy(gts), None,
        torch.from_numpy(labels),
    )
    # repo side: pad to 9 gts, 4 invalid
    pad_g = np.concatenate([gts, np.zeros((4, 4), np.float32)])
    pad_l = np.concatenate([labels, np.zeros(4, np.int64)])
    valid = np.array([True] * 5 + [False] * 4)
    got = max_iou_assign(
        jnp.asarray(bxs), jnp.asarray(pad_g),
        jnp.asarray(pad_l, jnp.int32), jnp.asarray(valid),
        0.5, 0.4, 0.2,
    )
    np.testing.assert_array_equal(
        np.asarray(got.assigned_gt_inds), r.gt_inds.numpy()
    )


# ------------------------------------------------------------------ ATSS


def _grid_anchors(strides, sizes, scale=6.0):
    """Per-level square anchors centered at x*stride (ATSS convention)."""
    out = []
    for s, (h, w) in zip(strides, sizes):
        ys, xs = np.meshgrid(
            np.arange(h) * s, np.arange(w) * s, indexing="ij"
        )
        c = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        half = scale * s / 2
        out.append(np.concatenate([c - half, c + half], -1))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_atss_assigner_matches_reference(seed):
    rs = np.random.RandomState(seed)
    strides = (8, 16, 32)
    sizes = [(16, 16), (8, 8), (4, 4)]
    lvl = _grid_anchors(strides, sizes)
    gts = _rand_boxes(rs, 6, span=128.0, min_sz=10.0, max_sz=100.0)
    labels = rs.randint(0, 5, 6).astype(np.int64)

    ref = mmdet.assigners.atss_assigner.ATSSAssigner(topk=9)
    r = ref.assign(
        torch.from_numpy(np.concatenate(lvl)),
        [a.shape[0] for a in lvl],
        torch.from_numpy(gts),
        None,
        torch.from_numpy(labels),
    )
    assigned = atss_assign(
        [jnp.asarray(a) for a in lvl], jnp.asarray(gts), jnp.ones(6, bool)
    )
    got_inds = np.where(np.asarray(assigned) < 0, 0, np.asarray(assigned) + 1)
    np.testing.assert_array_equal(got_inds, r.gt_inds.numpy())


# ---------------------------------------------------------- CenterRegion


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_center_region_assigner_matches_reference(seed):
    rs = np.random.RandomState(seed)
    bxs = _rand_boxes(rs, 160, span=200.0, min_sz=6.0, max_sz=40.0)
    gts = _rand_boxes(rs, 6, span=200.0, min_sz=20.0, max_sz=120.0)
    labels = rs.randint(0, 5, 6).astype(np.int64)

    ref = mmdet.assigners.center_region_assigner.CenterRegionAssigner(
        pos_scale=0.2, neg_scale=0.2, min_pos_iof=1e-2
    )
    r = ref.assign(
        torch.from_numpy(bxs), torch.from_numpy(gts), None,
        torch.from_numpy(labels),
    )
    got, shadowed = center_region_assign(
        jnp.asarray(bxs), jnp.asarray(gts), jnp.asarray(labels, jnp.int32),
        jnp.ones(6, bool), pos_scale=0.2, neg_scale=0.2,
    )
    np.testing.assert_array_equal(
        np.asarray(got.assigned_gt_inds), r.gt_inds.numpy()
    )
    # shadowed pair set: reference emits (anchor_ind, class_label) rows
    ref_shadow = r.get_extra_property("shadowed_labels")
    ref_pairs = (
        set(map(tuple, ref_shadow.numpy().tolist()))
        if ref_shadow is not None and len(ref_shadow)
        else set()
    )
    sh = np.asarray(shadowed)
    got_pairs = {
        (int(n), int(labels[g]))
        for n, g in zip(*np.nonzero(sh))
    }
    assert got_pairs == ref_pairs


# ------------------------------------------------------------------ Point


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("pos_num", [1, 3])
def test_point_assigner_matches_reference(seed, pos_num):
    rs = np.random.RandomState(seed)
    strides = (8, 16, 32, 64)
    pts, lvls = [], []
    for s in strides:
        n = (128 // s) ** 2
        g = np.arange(128 // s) * s + s // 2
        ys, xs = np.meshgrid(g, g, indexing="ij")
        pts.append(np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32))
        lvls.append(np.full(n, int(np.log2(s)), np.int32))
    points_xy = np.concatenate(pts)
    points_lvl = np.concatenate(lvls)
    gts = _rand_boxes(rs, 5, span=128.0, min_sz=8.0, max_sz=100.0)
    labels = rs.randint(0, 5, 5).astype(np.int64)

    ref = mmdet.assigners.point_assigner.PointAssigner(scale=4, pos_num=pos_num)
    ref_points = torch.from_numpy(
        np.concatenate(
            [points_xy, (2.0 ** points_lvl)[:, None].astype(np.float32)], -1
        )
    )
    r = ref.assign(ref_points, torch.from_numpy(gts), None,
                   torch.from_numpy(labels))

    got = point_assign(
        jnp.asarray(points_xy), jnp.asarray(points_lvl), jnp.asarray(gts),
        jnp.asarray(labels, jnp.int32), jnp.ones(5, bool),
        scale=4.0, pos_num=pos_num,
    )
    np.testing.assert_array_equal(
        np.asarray(got.assigned_gt_inds), r.gt_inds.numpy()
    )
    np.testing.assert_array_equal(np.asarray(got.labels), r.labels.numpy())


# ----------------------------------------------------------------- Region


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_region_assigner_matches_reference(seed):
    rs = np.random.RandomState(seed)
    strides = (8, 16, 32)
    sizes = [(16, 16), (8, 8), (4, 4)]
    anchor_scale = 8.0
    mlvl_anchors, mlvl_valid = [], []
    for s, (h, w) in zip(strides, sizes):
        ys, xs = np.meshgrid(
            np.arange(h) * s, np.arange(w) * s, indexing="ij"
        )
        c = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        half = anchor_scale * s / 2
        mlvl_anchors.append(
            torch.from_numpy(np.concatenate([c - half, c + half], -1))
        )
        mlvl_valid.append(torch.ones(h * w, dtype=torch.bool))
    gts = _rand_boxes(rs, 4, span=128.0, min_sz=16.0, max_sz=110.0)

    ref = mmdet.assigners.region_assigner.RegionAssigner(
        center_ratio=0.2, ignore_ratio=0.5
    )
    r = ref.assign(
        mlvl_anchors,
        mlvl_valid,
        torch.from_numpy(gts),
        dict(img_shape=(128, 128, 3)),
        [torch.Size(sz) for sz in sizes],
        anchor_scale,
        list(strides),
        allowed_border=-1,
    )
    # The reference's adjacent-level ignore projection is dead code: its
    # mlvl_ignore_flags is a LONG tensor (region_assigner.py:130), so the
    # final `assigned[ignore_flags] = -1` (:185-187) gather-indexes by the
    # flag VALUES — writing -1 at anchor index 0 always, and at index 1
    # exactly when any adjacent-gt r2 region is non-empty at that level.
    # Emulate that bug on top of the repo's intended-semantics output
    # (adjacent_ignore=False) and require EXACT equality with the reference.
    got = np.array(region_assign(
        jnp.asarray(gts), jnp.ones(4, bool), sizes, strides,
        anchor_scale=anchor_scale, center_ratio=0.2, ignore_ratio=0.5,
        adjacent_ignore=False,
    ))
    scale = np.sqrt((gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]))
    lvl_of = np.clip(
        np.floor(np.log2(scale) - np.log2(anchor_scale * strides[0]) + 0.5),
        0, len(strides) - 1).astype(int)
    r2 = (1 - 0.5) / 2
    off = 0
    for li, (s, (h, w)) in enumerate(zip(strides, sizes)):
        got[off] = -1  # gather write at the 0-flag value
        flag_set = False
        for g in range(len(gts)):
            if abs(lvl_of[g] - li) != 1:
                continue
            b = gts[g] / s
            x1 = min(max(np.round((1 - r2) * b[0] + r2 * b[2]), 0), w)
            y1 = min(max(np.round((1 - r2) * b[1] + r2 * b[3]), 0), h)
            x2 = min(max(np.round(r2 * b[0] + (1 - r2) * b[2]), 0), w)
            y2 = min(max(np.round(r2 * b[1] + (1 - r2) * b[3]), 0), h)
            # integer anchor centers inside [x1,x2]x[y1,y2]
            if (np.ceil(x1) <= min(np.floor(x2), w - 1)
                    and np.ceil(y1) <= min(np.floor(y2), h - 1)):
                flag_set = True
        if flag_set:
            got[off + 1] = -1  # gather write at the 1-flag value
        off += h * w
    np.testing.assert_array_equal(got, r.gt_inds.numpy())


# ----------------------------------------------------------------- Coders


@pytest.mark.parametrize(
    "means,stds",
    [((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0)),
     ((0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2))],
)
def test_delta_xywh_coder_matches_reference(means, stds):
    rs = np.random.RandomState(3)
    rois = _rand_boxes(rs, 64)
    gts = _rand_boxes(rs, 64)
    ref = mmdet.coders.delta_xywh_bbox_coder.DeltaXYWHBBoxCoder(
        target_means=means, target_stds=stds
    )
    enc = ref.encode(torch.from_numpy(rois), torch.from_numpy(gts))
    got_enc = box_ops.bbox2delta(jnp.asarray(rois), jnp.asarray(gts),
                                 means, stds)
    np.testing.assert_allclose(np.asarray(got_enc), enc.numpy(),
                               rtol=1e-5, atol=1e-5)

    # decode with multi-class deltas + border clipping
    deltas = rs.uniform(-2, 2, (64, 12)).astype(np.float32)
    dec = ref.decode(torch.from_numpy(rois), torch.from_numpy(deltas),
                     max_shape=(256, 256), wh_ratio_clip=16 / 1000)
    got_dec = box_ops.delta2bbox(jnp.asarray(rois), jnp.asarray(deltas),
                                 means, stds, max_shape=(256, 256),
                                 wh_ratio_clip=16 / 1000)
    np.testing.assert_allclose(np.asarray(got_dec), dec.numpy(),
                               rtol=1e-4, atol=1e-3)


def test_tblr_coder_decode_matches_reference():
    rs = np.random.RandomState(5)
    stride = 16
    px = rs.uniform(20, 200, 40).astype(np.float32)
    py = rs.uniform(20, 200, 40).astype(np.float32)
    pred = rs.uniform(0.01, 2.0, (40, 4)).astype(np.float32)
    # FSAF priors: square anchors of side `stride` centered at (px, py)
    priors = np.stack(
        [px - stride / 2, py - stride / 2, px + stride / 2, py + stride / 2],
        -1,
    )
    ref = mmdet.coders.tblr_bbox_coder.TBLRBBoxCoder(normalizer=4.0)
    dec = ref.decode(torch.from_numpy(priors), torch.from_numpy(pred))
    got = _tblr_decode(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pred),
                       stride, normalizer=4.0)
    np.testing.assert_allclose(np.asarray(got), dec.numpy(), rtol=1e-5,
                               atol=1e-4)


# -------------------------------------------------------------- Hungarian


@pytest.mark.parametrize("seed", [0, 1])
def test_detr_hungarian_matches_reference(seed):
    rs = np.random.RandomState(seed)
    q, g, nc = 24, 5, 8
    h, w = 240, 320
    cls_logits = rs.randn(q, nc + 1).astype(np.float32)
    boxes_norm = rs.uniform(0.1, 0.6, (q, 4)).astype(np.float32)  # cxcywh
    gts = _rand_boxes(rs, g, span=200.0)
    labels = rs.randint(0, nc, g).astype(np.int64)

    ref = mmdet.assigners.hungarian_assigner.HungarianAssigner(
        cls_cost=dict(type="ClassificationCost", weight=1.0),
        reg_cost=dict(type="BBoxL1Cost", weight=5.0),
        iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0),
    )
    r = ref.assign(
        torch.from_numpy(boxes_norm), torch.from_numpy(cls_logits),
        torch.from_numpy(gts), torch.from_numpy(labels),
        dict(img_shape=(h, w, 3)),
    )

    cost, _, _ = detr_cost(
        jnp.asarray(cls_logits), jnp.asarray(boxes_norm), jnp.asarray(gts),
        jnp.asarray(labels, jnp.int32), jnp.ones(g, bool), (h, w), nc,
    )
    rows, cols = jv_lap(np.asarray(cost))
    got_inds = np.zeros(q, np.int64)
    got_inds[rows] = cols + 1
    np.testing.assert_array_equal(got_inds, r.gt_inds.numpy())

    # cost matrix itself vs the reference's cost objects
    mc = mmdet.assigners.hungarian_assigner
    factor = torch.tensor([w, h, w, h], dtype=torch.float32)
    ref_cost = (
        ref.cls_cost(torch.from_numpy(cls_logits), torch.from_numpy(labels))
        + ref.reg_cost(torch.from_numpy(boxes_norm),
                       torch.from_numpy(gts) / factor)
        + ref.iou_cost(
            mc.bbox_cxcywh_to_xyxy(torch.from_numpy(boxes_norm)) * factor,
            torch.from_numpy(gts),
        )
    )
    np.testing.assert_allclose(np.asarray(cost)[:, :g], ref_cost.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_sparse_rcnn_cost_matches_reference_focal_cost():
    rs = np.random.RandomState(11)
    q, g, nc = 16, 4, 6
    h, w = 200, 200
    cls_logits = rs.randn(q, nc).astype(np.float32)
    boxes_abs = _rand_boxes(rs, q, span=180.0)
    gts = _rand_boxes(rs, g, span=180.0)
    labels = rs.randint(0, nc, g).astype(np.int64)

    mcmod = mmdet.assigners.hungarian_assigner  # reuse loaded match_costs
    from mmdet.core.bbox.match_costs import build_match_cost

    cls_cost = build_match_cost(dict(type="FocalLossCost", weight=2.0))
    reg_cost = build_match_cost(dict(type="BBoxL1Cost", weight=5.0))
    iou_cost = build_match_cost(
        dict(type="IoUCost", iou_mode="giou", weight=2.0)
    )
    factor = torch.tensor([w, h, w, h], dtype=torch.float32)
    # sparse_roi_head.py:193-195 normalizes pred xyxy -> cxcywh/whwh before
    # assign; BBoxL1Cost(box_format='xyxy') converts back to normalized xyxy
    # and the IoU cost de-normalizes to absolute — reproduce that chain.
    xyxy2ccwh = mmdet.transforms.bbox_xyxy_to_cxcywh
    ccwh2xyxy = mmdet.transforms.bbox_cxcywh_to_xyxy
    pred_ccwh = xyxy2ccwh(torch.from_numpy(boxes_abs) / factor)
    ref_cost = (
        cls_cost(torch.from_numpy(cls_logits), torch.from_numpy(labels))
        + reg_cost(pred_ccwh, torch.from_numpy(gts) / factor)
        + iou_cost(ccwh2xyxy(pred_ccwh) * factor, torch.from_numpy(gts))
    )
    got = sparse_cost(
        jnp.asarray(cls_logits), jnp.asarray(boxes_abs), jnp.asarray(gts),
        jnp.asarray(labels, jnp.int32), jnp.ones(g, bool), (h, w), nc,
    )
    got_cost = got[0] if isinstance(got, tuple) else got
    np.testing.assert_allclose(np.asarray(got_cost)[:, :g], ref_cost.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------- RandomSampler


def test_random_sampler_saturation_matches_reference():
    """When candidates <= quota both samplers must take ALL of them —
    deterministic, so exact equality holds regardless of RNG."""
    rs = np.random.RandomState(0)
    n = 64
    assigned = np.zeros(n, np.int64)
    assigned[:5] = [1, 2, 1, 3, 2]  # 5 positives
    assigned[5:12] = 0  # negatives
    assigned[12:] = -1  # ignored
    bxs = _rand_boxes(rs, n)
    gts = _rand_boxes(rs, 3)
    labels = np.array([0, 1, 2], np.int64)

    AR = mmdet.assigners.assign_result.AssignResult
    r = AR(3, torch.from_numpy(assigned),
           torch.rand(n), torch.from_numpy(
               np.where(assigned > 0, labels[np.maximum(assigned - 1, 0)], -1)))
    ref = mmdet.samplers.random_sampler.RandomSampler(
        num=256, pos_fraction=0.5, neg_pos_ub=-1, add_gt_as_proposals=False
    )
    res = ref.sample(r, torch.from_numpy(bxs), torch.from_numpy(gts))
    assert set(res.pos_inds.tolist()) == {0, 1, 2, 3, 4}
    assert set(res.neg_inds.tolist()) == set(range(5, 12))

    got = random_sample_masks(
        AssignResult(jnp.asarray(assigned, jnp.int32),
                     jnp.zeros(n), jnp.zeros(n, jnp.int32)),
        jax.random.PRNGKey(0), num=256, pos_fraction=0.5,
    )
    np.testing.assert_array_equal(np.asarray(got.pos_mask),
                                  assigned > 0)
    np.testing.assert_array_equal(np.asarray(got.neg_mask),
                                  assigned == 0)


def test_random_sampler_oversubscribed_count_contract():
    """Oversubscribed case: counts and candidate-subset membership must agree
    (exact indices are RNG-dependent and can't match across frameworks)."""
    rs = np.random.RandomState(1)
    n = 600
    assigned = np.zeros(n, np.int64)
    assigned[:200] = rs.randint(1, 4, 200)
    bxs = _rand_boxes(rs, n)
    gts = _rand_boxes(rs, 3)

    AR = mmdet.assigners.assign_result.AssignResult
    r = AR(3, torch.from_numpy(assigned), torch.rand(n),
           torch.from_numpy(np.where(assigned > 0, 0, -1)))
    ref = mmdet.samplers.random_sampler.RandomSampler(
        num=256, pos_fraction=0.25, neg_pos_ub=-1, add_gt_as_proposals=False
    )
    res = ref.sample(r, torch.from_numpy(bxs), torch.from_numpy(gts))
    assert len(res.pos_inds) == 64 and len(res.neg_inds) == 192

    got = random_sample_masks(
        AssignResult(jnp.asarray(assigned, jnp.int32),
                     jnp.zeros(n), jnp.zeros(n, jnp.int32)),
        jax.random.PRNGKey(3), num=256, pos_fraction=0.25,
    )
    assert int(np.asarray(got.pos_mask).sum()) == 64
    assert int(np.asarray(got.neg_mask).sum()) == 192
    assert np.all(assigned[np.asarray(got.pos_mask)] > 0)
    assert np.all(assigned[np.asarray(got.neg_mask)] == 0)


# -------------------------------------------------------- anchor generators


def test_rpn_dc5_anchors_match_reference_generator():
    """The canonical VID RPN anchor grid (stride 16, scales [4,8,16,32],
    ratios [.5,1,2] — faster_rcnn_r50_dc5.py:25-29) vs the reference's own
    AnchorGenerator."""
    from lowlightenvironmentvideoobjectdetection_tpu.core.anchors import (
        AnchorGenerator as RepoGen,
    )

    ref = mmdet.assigners.max_iou_assigner  # noqa: F841 (package loaded)
    from mmdet.core.anchor import AnchorGenerator as RefGen

    sizes = [(8, 8)]
    got = RepoGen(strides=[16], ratios=[0.5, 1.0, 2.0],
                  scales=[4, 8, 16, 32]).grid_anchors(sizes)[0]
    want = RefGen(strides=[16], ratios=[0.5, 1.0, 2.0],
                  scales=[4, 8, 16, 32]).grid_anchors(
        [torch.Size(s) for s in sizes], device="cpu")[0]
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-3)


def test_retina_anchors_match_reference_generator():
    from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.retina_head import (
        retina_anchor_generator,
    )
    from mmdet.core.anchor import AnchorGenerator as RefGen

    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    got = retina_anchor_generator().grid_anchors(sizes)
    want = RefGen(strides=[8, 16, 32, 64, 128], ratios=[0.5, 1.0, 2.0],
                  octave_base_scale=4, scales_per_octave=3).grid_anchors(
        [torch.Size(s) for s in sizes], device="cpu")
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w.numpy(), rtol=1e-5, atol=1e-3)


def test_atss_anchors_match_reference_generator():
    from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.atss_head import (
        atss_anchors,
    )
    from mmdet.core.anchor import AnchorGenerator as RefGen

    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    got = atss_anchors(sizes)
    want = RefGen(strides=[8, 16, 32, 64, 128], ratios=[1.0],
                  octave_base_scale=8, scales_per_octave=1).grid_anchors(
        [torch.Size(s) for s in sizes], device="cpu")
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5,
                                   atol=1e-3)


def test_ssd_anchors_match_reference_generator():
    """ssd300 config generator (scale_major=False, basesize_ratio_range
    (0.15, 0.9)) vs the reference's SSDAnchorGenerator — both values AND
    per-cell anchor order (the order maps prediction channels)."""
    from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.ssd import (
        ssd_anchors,
    )
    from mmdet.core.anchor import SSDAnchorGenerator

    sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    got = ssd_anchors(sizes)
    want = SSDAnchorGenerator(
        scale_major=False, input_size=300, basesize_ratio_range=(0.15, 0.9),
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]).grid_anchors(
        [torch.Size(s) for s in sizes], device="cpu")
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5,
                                   atol=1e-3)


# ------------------------------------------------- DETR aux decoder losses


def _ref_detr_loss_single(cls_logits, boxes_norm, gts, labels, hw, nc):
    """transformer_head.py loss_single transcription on reference code:
    reference HungarianAssigner for matching, CE with bg weight 0.1 and
    avg_factor = num_pos + 0.1*num_neg, L1 on normalized cxcywh / num_pos,
    GIoU (1 - giou) on absolute xyxy / num_pos."""
    h, w = hw
    q = cls_logits.shape[0]
    assigner = mmdet.assigners.hungarian_assigner.HungarianAssigner(
        cls_cost=dict(type="ClassificationCost", weight=1.0),
        reg_cost=dict(type="BBoxL1Cost", weight=5.0),
        iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0),
    )
    r = assigner.assign(
        torch.from_numpy(boxes_norm), torch.from_numpy(cls_logits),
        torch.from_numpy(gts), torch.from_numpy(labels),
        dict(img_shape=(h, w, 3)),
    )
    gt_inds = r.gt_inds.numpy()
    pos = gt_inds > 0
    num_pos = max(int(pos.sum()), 1)
    num_neg = q - int(pos.sum())
    nc_bg = nc  # background index
    tgt = np.full(q, nc_bg, np.int64)
    tgt[pos] = labels[gt_inds[pos] - 1]
    logp = torch.log_softmax(torch.from_numpy(cls_logits), dim=-1).numpy()
    wv = np.where(tgt == nc_bg, 0.1, 1.0)
    loss_cls = float(-(logp[np.arange(q), tgt] * wv).sum()
                     / (pos.sum() + 0.1 * num_neg))

    factor = np.array([w, h, w, h], np.float32)
    gt_norm = gts / factor
    gt_ccwh = np.stack([
        (gt_norm[:, 0] + gt_norm[:, 2]) / 2,
        (gt_norm[:, 1] + gt_norm[:, 3]) / 2,
        gt_norm[:, 2] - gt_norm[:, 0], gt_norm[:, 3] - gt_norm[:, 1]], -1)
    mb = boxes_norm[pos]
    mt = gt_ccwh[gt_inds[pos] - 1]
    loss_bbox = float(np.abs(mb - mt).sum() / num_pos)

    def ccwh2xyxy(b):
        return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1)

    pb = ccwh2xyxy(mb) * factor
    tb = gts[gt_inds[pos] - 1]
    giou = np.diagonal(np.asarray(_np_giou(pb, tb)))
    loss_giou = float((1.0 - giou).sum() / num_pos)
    return loss_cls * 1.0, loss_bbox * 5.0, loss_giou * 2.0


def _np_giou(a, b):
    iou_t = mmdet.assigners.hungarian_assigner  # reuse loaded iou calculator
    from mmdet.core.bbox.iou_calculators import bbox_overlaps as bo

    g = bo(torch.from_numpy(a), torch.from_numpy(b), mode="giou")
    return g.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_detr_aux_loss_per_layer_matches_reference(seed):
    """detr_loss_all == sum over decoder layers, each layer equal to the
    reference loss_single semantics (reference HungarianAssigner matching +
    CE/L1/GIoU with the reference avg factors)."""
    from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.detr import (
        detr_loss, detr_loss_all,
    )

    rs = np.random.RandomState(seed)
    L, q, g, nc = 3, 20, 4, 6
    h, w = 160, 224
    cls_all = rs.randn(L, q, nc + 1).astype(np.float32)
    boxes_all = rs.uniform(0.05, 0.7, (L, q, 4)).astype(np.float32)
    gts = _rand_boxes(rs, g, span=150.0)
    labels = rs.randint(0, nc, g).astype(np.int64)

    totals = np.zeros(3)
    for i in range(L):
        ref = _ref_detr_loss_single(cls_all[i], boxes_all[i], gts, labels,
                                    (h, w), nc)
        got = detr_loss(jnp.asarray(cls_all[i]), jnp.asarray(boxes_all[i]),
                        jnp.asarray(gts), jnp.asarray(labels, jnp.int32),
                        jnp.ones(g, bool), (h, w), nc)
        np.testing.assert_allclose(
            [float(got.loss_cls), float(got.loss_bbox), float(got.loss_giou)],
            ref, rtol=1e-4, atol=1e-5)
        totals += np.asarray(ref)

    allo = detr_loss_all(jnp.asarray(cls_all), jnp.asarray(boxes_all),
                         jnp.asarray(gts), jnp.asarray(labels, jnp.int32),
                         jnp.ones(g, bool), (h, w), nc)
    np.testing.assert_allclose(
        [float(allo.loss_cls), float(allo.loss_bbox), float(allo.loss_giou)],
        totals, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- eval_map


def _random_eval_fixture(rs, num_imgs=4, num_classes=6):
    dets, anns = [], []
    for _ in range(num_imgs):
        per_cls = []
        for _c in range(num_classes):
            nd = rs.randint(0, 8)
            if nd == 0:
                per_cls.append(np.zeros((0, 5), np.float32))
            else:
                b = _rand_boxes(rs, nd)
                s = rs.uniform(0.05, 1.0, (nd, 1)).astype(np.float32)
                per_cls.append(np.concatenate([b, s], -1))
        dets.append(per_cls)
        ng = rs.randint(1, 10)
        anns.append(dict(
            bboxes=_rand_boxes(rs, ng),
            labels=rs.randint(0, num_classes, ng).astype(np.int64),
        ))
    return dets, anns


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("iou_thr", [0.5, 0.75])
def test_eval_map_area_matches_reference(seed, iou_thr):
    rs = np.random.RandomState(seed)
    dets, anns = _random_eval_fixture(rs)
    ref_map, ref_res = mmdet.mean_ap.eval_map(
        dets, anns, iou_thr=iou_thr, nproc=1
    )
    got_map, got_res = repo_eval_map(dets, anns, iou_thr=iou_thr, mode="area")
    assert got_map == pytest.approx(ref_map, abs=1e-6)
    for rr, gr in zip(ref_res, got_res):
        assert gr["num_gts"] == rr["num_gts"]
        assert gr["ap"] == pytest.approx(float(rr["ap"]), abs=1e-6)


def test_eval_map_11points_matches_reference_voc07():
    rs = np.random.RandomState(9)
    dets, anns = _random_eval_fixture(rs, num_imgs=5, num_classes=4)
    ref_map, _ = mmdet.mean_ap.eval_map(
        dets, anns, iou_thr=0.5, dataset="voc07", nproc=1
    )
    got_map, _ = repo_eval_map(dets, anns, iou_thr=0.5, mode="11points")
    assert got_map == pytest.approx(ref_map, abs=1e-6)


def _dense_overlap_fixture(rs, num_imgs=3, num_classes=3, with_ignore=True):
    """Adversarial fixture: jittered near-duplicate dets over clustered gts
    so several dets share the same argmax gt (double coverage), plus
    optional bboxes_ignore. This is the regime where the pre-round-5
    matcher diverged from the reference (VERDICT r4 missing #1)."""
    dets, anns = [], []
    for _ in range(num_imgs):
        ng = rs.randint(2, 6)
        base = rs.uniform(0, 40, (ng, 2))
        wh = rs.uniform(8, 24, (ng, 2))
        gtb = np.concatenate([base, base + wh], 1).astype(np.float32)
        ann = dict(bboxes=gtb,
                   labels=rs.randint(0, num_classes, ng).astype(np.int64))
        if with_ignore:
            ni = rs.randint(0, 3)
            ib = rs.uniform(0, 40, (ni, 2))
            iwh = rs.uniform(8, 24, (ni, 2))
            ann["bboxes_ignore"] = np.concatenate([ib, ib + iwh], 1).astype(
                np.float32)
            ann["labels_ignore"] = rs.randint(0, num_classes, ni).astype(
                np.int64)
        anns.append(ann)
        per_cls = []
        for _c in range(num_classes):
            nd = rs.randint(3, 9)
            # every det is a jittered copy of some gt -> dense overlap
            src = gtb[rs.randint(0, ng, nd)]
            jit = rs.uniform(-4, 4, (nd, 4)).astype(np.float32)
            s = rs.uniform(0.05, 1.0, (nd, 1)).astype(np.float32)
            per_cls.append(np.concatenate([src + jit, s], -1))
        dets.append(per_cls)
    return dets, anns


def test_eval_map_double_coverage_repro():
    """The exact 2-det/2-gt repro from VERDICT r4: argmax-over-ALL-gts means
    the second det FPs on the covered gt instead of re-matching (reference
    mean_ap.py:204-228 -> mAP 0.5, the old repo matcher said 1.0)."""
    gts = np.array([[0, 0, 10, 10], [6, 0, 16, 10]], np.float32)
    dets = [[np.array([[0, 0, 10, 10, 0.9], [1, 0, 11, 10, 0.8]],
                      np.float32)]]
    ann = dict(bboxes=gts, labels=np.zeros(2, np.int64))
    ref_map, _ = mmdet.mean_ap.eval_map(dets, [ann], iou_thr=0.3, nproc=1)
    got_map, _ = repo_eval_map(dets, [ann], iou_thr=0.3)
    assert ref_map == pytest.approx(0.5, abs=1e-6)
    assert got_map == pytest.approx(ref_map, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("iou_thr", [0.3, 0.5])
def test_eval_map_dense_overlap_matches_reference(seed, iou_thr):
    rs = np.random.RandomState(100 + seed)
    dets, anns = _dense_overlap_fixture(rs)
    ref_map, ref_res = mmdet.mean_ap.eval_map(
        dets, anns, iou_thr=iou_thr, nproc=1)
    got_map, got_res = repo_eval_map(dets, anns, iou_thr=iou_thr)
    assert got_map == pytest.approx(ref_map, abs=1e-6)
    for rr, gr in zip(ref_res, got_res):
        assert gr["num_gts"] == rr["num_gts"]
        assert gr["num_dets"] == rr["num_dets"]
        assert gr["ap"] == pytest.approx(float(rr["ap"]), abs=1e-6)
        np.testing.assert_allclose(gr["recall"], rr["recall"], atol=1e-6)
        np.testing.assert_allclose(gr["precision"], rr["precision"],
                                   atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tpfp_imagenet_matches_reference(seed):
    """dataset='vid'/'det' selects tpfp_imagenet: size-adaptive per-gt IoU
    thresholds, best-UNCOVERED-gt matching, IoU vs (gt - 1)
    (reference mean_ap.py:59-150, dispatch at :326-329)."""
    rs = np.random.RandomState(200 + seed)
    dets, anns = _dense_overlap_fixture(rs, num_imgs=4)
    for ds_name in ("vid", "det"):
        ref_map, ref_res = mmdet.mean_ap.eval_map(
            dets, anns, iou_thr=0.5, dataset=ds_name, nproc=1)
        got_map, got_res = repo_eval_map(dets, anns, iou_thr=0.5,
                                         dataset=ds_name)
        assert got_map == pytest.approx(ref_map, abs=1e-6)
        for rr, gr in zip(ref_res, got_res):
            assert gr["ap"] == pytest.approx(float(rr["ap"]), abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_eval_map_scale_ranges_matches_reference(seed):
    """scale_ranges: (min, max) -> area in [min**2, max**2); per-scale
    num_gts filtering and per-scale mean_ap list (reference
    mean_ap.py:313-316, 341-352, 380-390)."""
    rs = np.random.RandomState(300 + seed)
    dets, anns = _dense_overlap_fixture(rs)
    scale_ranges = [(0, 16), (16, 32), (32, 1e5)]
    ref_map, ref_res = mmdet.mean_ap.eval_map(
        dets, anns, scale_ranges=scale_ranges, iou_thr=0.5, nproc=1)
    got_map, got_res = repo_eval_map(dets, anns, scale_ranges=scale_ranges,
                                     iou_thr=0.5)
    np.testing.assert_allclose(got_map, ref_map, atol=1e-6)
    for rr, gr in zip(ref_res, got_res):
        np.testing.assert_allclose(np.asarray(gr["num_gts"]),
                                   np.asarray(rr["num_gts"]))
        np.testing.assert_allclose(np.asarray(gr["ap"], float),
                                   np.asarray(rr["ap"], float), atol=1e-6)


def test_eval_map_voc07_dense_matches_reference():
    rs = np.random.RandomState(400)
    dets, anns = _dense_overlap_fixture(rs, num_imgs=4, num_classes=4)
    ref_map, _ = mmdet.mean_ap.eval_map(
        dets, anns, iou_thr=0.5, dataset="voc07", nproc=1)
    got_map, _ = repo_eval_map(dets, anns, iou_thr=0.5, dataset="voc07")
    assert got_map == pytest.approx(ref_map, abs=1e-6)
