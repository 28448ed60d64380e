"""Target assignment and sampling, re-expressed with static shapes + masks.

Behavior parity (semantics) with the reference:
- MaxIoUAssigner: mmdetection/mmdet/core/bbox/assigners/max_iou_assigner.py:10
  (pos/neg thresholding + low-quality gt->best-anchor matching with
  ``gt_max_assign_all``).
- RandomSampler: mmdetection/mmdet/core/bbox/samplers/random_sampler.py:8
  (pos quota = num*pos_fraction, negatives fill the remainder).

The PyTorch originals produce *dynamic-size* index lists; here everything is a
fixed-shape mask / fixed-count gather so the whole training step stays inside
one XLA compilation. Padded (invalid) gts/boxes are handled by validity masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


class AssignResult(NamedTuple):
    """Static-shape assignment over N candidate boxes.

    assigned_gt_inds: [N] int32. -1 = unassigned (ignored), 0 = negative,
      k>0 = matched to gt index k-1. Same encoding as the reference.
    max_overlaps: [N] best IoU with any valid gt.
    labels: [N] int32 class label of the matched gt (-1 where not positive).
    """

    assigned_gt_inds: jnp.ndarray
    max_overlaps: jnp.ndarray
    labels: jnp.ndarray


def max_iou_assign(
    boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float = 0.0,
    box_valid: Optional[jnp.ndarray] = None,
    match_low_quality: bool = True,
    gt_max_assign_all: bool = True,
    overlaps: Optional[jnp.ndarray] = None,
) -> AssignResult:
    """Assign each of N boxes to one of G (padded) gts.

    boxes: [N, 4]; gt_boxes: [G, 4]; gt_labels: [G] int32; gt_valid: [G] bool.
    box_valid: optional [N] bool (anchors outside image / padded proposals).
    overlaps: optional precomputed [G, N] IoU matrix replacing the internal
      ``bbox_overlaps(gt_boxes, boxes)`` — the hook ApproxMaxIoUAssigner
    (mmdetection/mmdet/core/bbox/assigners/approx_max_iou_assigner.py:121-125)
      needs: its overlaps are the per-square max over the octave's approx
      anchors, after which assignment proceeds exactly as MaxIoU.
    """
    n = overlaps.shape[1] if overlaps is not None else boxes.shape[0]
    if overlaps is None:
        overlaps = bbox_overlaps(gt_boxes, boxes)  # [G, N]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    if box_valid is not None:
        overlaps = jnp.where(box_valid[None, :], overlaps, -1.0)

    max_overlaps = jnp.max(overlaps, axis=0)  # [N]
    argmax_overlaps = jnp.argmax(overlaps, axis=0)  # [N]

    assigned = jnp.full((n,), -1, jnp.int32)
    # negatives: 0 <= max_overlap < neg_iou_thr
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, assigned
    )
    # positives: max_overlap >= pos_iou_thr
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps.astype(jnp.int32) + 1, assigned
    )

    if match_low_quality:
        # Each gt claims the box(es) with its own max overlap, if >= min_pos_iou.
        gt_max = jnp.max(overlaps, axis=1)  # [G]
        claim_ok = gt_valid & (gt_max >= min_pos_iou)
        if gt_max_assign_all:
            # boxes tying a gt's max overlap all get assigned to it; later gts
            # override earlier ones as in the reference's sequential loop.
            is_max = overlaps == gt_max[:, None]  # [G, N]
            claim = is_max & claim_ok[:, None] & (gt_max[:, None] > 0)
            gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32) + 1
            # last (highest-index) claiming gt wins -> scan via max over
            # (claim * gt_id) replicates "later overrides" because the loop
            # in the reference runs in ascending gt order.
            claimed_id = jnp.max(jnp.where(claim, gt_ids[:, None], 0), axis=0)
            assigned = jnp.where(claimed_id > 0, claimed_id, assigned)
        else:
            gt_argmax = jnp.argmax(overlaps, axis=1)  # [G]
            def body(i, acc):
                return jnp.where(
                    claim_ok[i] & (gt_max[i] > 0),
                    acc.at[gt_argmax[i]].set(i + 1),
                    acc,
                )
            assigned = jax.lax.fori_loop(0, gt_boxes.shape[0], body, assigned)

    labels = jnp.where(
        assigned > 0,
        gt_labels[jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)],
        -1,
    ).astype(jnp.int32)
    return AssignResult(assigned, max_overlaps, labels)


def point_assign(
    points_xy: jnp.ndarray,
    points_lvl: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    scale: float = 4.0,
    pos_num: int = 1,
) -> AssignResult:
    """PointAssigner (mmdetection/mmdet/core/bbox/assigners/point_assigner.py:
    22-131), static-shape. Used by RepPoints' init stage.

    points_xy: [P, 2]; points_lvl: [P] int32 = log2(point stride)
    (PointGenerator emits (x, y, stride); the reference takes
    ``torch.log2(stride).int()``). gt level = trunc((log2(w/scale) +
    log2(h/scale)) / 2) clamped to [points_lvl.min(), points_lvl.max()].
    Each gt claims its ``pos_num`` nearest points *on its level* by
    gt-size-normalized euclidean distance; a point contested by several gts
    goes to the strictly closer one (the reference's sequential gt loop
    updates only on ``min_dist < assigned_gt_dist``, so ties keep the
    earlier gt). max_overlaps is returned as zeros (the reference returns
    ``None``).
    """
    num_p = points_xy.shape[0]
    num_g = gt_boxes.shape[0]
    gt_xy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
    gt_wh = jnp.maximum(gt_boxes[:, 2:] - gt_boxes[:, :2], 1e-6)
    gt_lvl = jnp.trunc(
        (jnp.log2(gt_wh[:, 0] / scale) + jnp.log2(gt_wh[:, 1] / scale)) / 2
    ).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, jnp.min(points_lvl), jnp.max(points_lvl))

    dist = jnp.linalg.norm(
        (points_xy[:, None, :] - gt_xy[None, :, :]) / gt_wh[None, :, :],
        axis=-1,
    )  # [P, G]
    masked = jnp.where(
        (points_lvl[:, None] == gt_lvl[None, :]) & gt_valid[None, :],
        dist, jnp.inf)
    k = min(pos_num, num_p)
    neg_d, cand_p = jax.lax.top_k(-masked.T, k)  # [G, k]
    cand_d = -neg_d
    flat_p = cand_p.reshape(-1)
    flat_d = cand_d.reshape(-1)
    flat_g = jnp.repeat(jnp.arange(num_g, dtype=jnp.int32), k)

    def body(i, carry):
        agt, adist = carry
        p, d, g = flat_p[i], flat_d[i], flat_g[i]
        take = d < adist[p]
        agt = agt.at[p].set(jnp.where(take, g + 1, agt[p]))
        adist = adist.at[p].set(jnp.where(take, d, adist[p]))
        return agt, adist

    assigned, _ = jax.lax.fori_loop(
        0, num_g * k, body,
        (jnp.zeros((num_p,), jnp.int32), jnp.full((num_p,), jnp.inf)))
    labels = jnp.where(
        assigned > 0,
        gt_labels[jnp.clip(assigned - 1, 0, num_g - 1)],
        -1,
    ).astype(jnp.int32)
    return AssignResult(assigned, jnp.zeros((num_p,), jnp.float32), labels)


def center_region_assign(
    boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_scale: float,
    neg_scale: float,
    min_pos_iof: float = 1e-2,
):
    """CenterRegionAssigner (mmdet/core/bbox/assigners/
    center_region_assigner.py:71-254), static-shape. Used by FSAF
    (pos_scale=neg_scale=0.2, min_pos_iof=0.01).

    A prior box is a positive candidate of a gt when its CENTER lies strictly
    inside the (full) gt box AND its IoF with the gt's pos_scale-shrunk core
    region exceeds ``min_pos_iof``; overlaps go to the smallest-area gt
    (get_gt_priorities). Shadow pairs — (box, gt) pairs whose IoF with the
    neg_scale region passes the threshold but that are not that gt's core
    positives, plus core pairs lost to a higher-priority gt — have the gt's
    class channel zeroed in the consumer's classification loss. A positive
    box that is simultaneously shadowed by another gt of the SAME class is
    demoted to background (foreground_dominate=False default, :239-247).

    Returns (AssignResult, shadowed [N, G] bool). assigned_gt_inds encoding:
    0 = negative, k>0 = gt k-1 (the gt_bboxes_ignore path, unused by the
    reference's FSAF config, is not modeled).
    """
    num_g = gt_boxes.shape[0]

    def _scale(b, s):
        c = (b[:, :2] + b[:, 2:]) / 2
        half = (b[:, 2:] - b[:, :2]) / 2 * s
        return jnp.concatenate([c - half, c + half], axis=-1)

    ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
    area_box = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)

    def _iof(regions):  # [N, G] intersection / box area
        ix1 = jnp.maximum(boxes[:, None, 0], regions[None, :, 0])
        iy1 = jnp.maximum(boxes[:, None, 1], regions[None, :, 1])
        ix2 = jnp.minimum(boxes[:, None, 2], regions[None, :, 2])
        iy2 = jnp.minimum(boxes[:, None, 3], regions[None, :, 3])
        inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
        return inter / jnp.maximum(area_box[:, None], 1e-6)

    in_gt = ((ctr[:, None, 0] > gt_boxes[None, :, 0])
             & (ctr[:, None, 0] < gt_boxes[None, :, 2])
             & (ctr[:, None, 1] > gt_boxes[None, :, 1])
             & (ctr[:, None, 1] < gt_boxes[None, :, 3]))
    in_core = (in_gt & (_iof(_scale(gt_boxes, pos_scale)) > min_pos_iof)
               & gt_valid[None, :])
    in_shadow = ((_iof(_scale(gt_boxes, neg_scale)) > min_pos_iof)
                 & ~in_core & gt_valid[None, :])

    # smaller gt area -> higher priority (get_gt_priorities :107-123)
    areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    order = jnp.argsort(-areas)  # descending area
    prio = jnp.zeros((num_g,), jnp.int32).at[order].set(
        jnp.arange(num_g, dtype=jnp.int32))
    pair_pr = jnp.where(in_core, prio[None, :], -1)
    best = jnp.argmax(pair_pr, axis=1)  # unique ranks -> no ties
    matched = jnp.any(in_core, axis=1)
    assigned = jnp.where(matched, best.astype(jnp.int32) + 1, 0)
    chosen = (jnp.arange(num_g)[None, :] == best[:, None]) & matched[:, None]
    shadowed = in_shadow | (in_core & ~chosen)
    labels = jnp.where(
        matched, gt_labels[jnp.clip(best, 0, num_g - 1)], -1
    ).astype(jnp.int32)

    # demote positives shadowed by a same-class gt (override, :239-247)
    same_lab = shadowed & (gt_labels[None, :] == labels[:, None]) & matched[:, None]
    override = jnp.any(same_lab, axis=1)
    assigned = jnp.where(override, 0, assigned)
    labels = jnp.where(override, -1, labels)
    result = AssignResult(assigned, jnp.zeros_like(area_box), labels)
    return result, shadowed


def region_assign(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    featmap_sizes,
    strides,
    anchor_scale: float = 8.0,
    center_ratio: float = 0.2,
    ignore_ratio: float = 0.5,
    adjacent_ignore: bool = True,
) -> jnp.ndarray:
    """RegionAssigner (mmdet/core/bbox/assigners/region_assigner.py:36-204),
    static-shape, for ONE square anchor per cell centered at ``x * stride``
    (Cascade RPN stage 1, crpn config center_ratio=.2 ignore_ratio=.5).

    Each gt maps to the level whose anchor size matches its scale
    (floor(log2(scale / (anchor_scale * strides[0])) + .5)); sequentially
    (later gt overrides earlier) its r2 ignore ring is written as -1 then
    its r1 center region as gt_id+1, both via round()ed feature-space
    regions against the INTEGER anchor grid centers; finally the r2 regions
    projected onto the two ADJACENT levels overwrite everything with -1.
    Returns the per-level [h*w] maps concatenated: -1 ignore / 0 negative /
    k>0 positive of gt k-1.

    ``adjacent_ignore`` implements the reference's *intended* adjacent-level
    ignore projection. The reference code NEVER applies it: region_assigner.py
    creates ``mlvl_ignore_flags`` as ``torch.zeros_like(assigned_gt_inds)`` (a
    LONG tensor, :130), so the final ``mlvl_assigned_gt_inds[lvl][ignore_flags]
    = -1`` (:185-187) is integer *gather* indexing by the 0/1 flag VALUES —
    it spuriously ignores anchor index 0 (and index 1 when any flag is set)
    and leaves the actual adjacent ring untouched. We keep the intended
    semantics as the default (SURVEY §7 "reference bugs to not replicate");
    ``adjacent_ignore=False`` disables the projection so goldens can emulate
    the buggy reference exactly (tests/test_ref_code_goldens.py).
    """
    num_g = gt_boxes.shape[0]
    num_lvls = len(featmap_sizes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(jnp.maximum(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]),
        1e-12))
    min_anchor_size = float(anchor_scale * strides[0])
    lvl_of = jnp.clip(
        jnp.floor(jnp.log2(scale) - jnp.log2(
            jnp.asarray(min_anchor_size)) + 0.5),
        0, num_lvls - 1).astype(jnp.int32)

    out = []
    for li, (h, w) in enumerate(featmap_sizes):
        stride = float(strides[li])
        gb = gt_boxes / stride
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]

        def masks(ratio, live):  # [G, h, w]
            x1 = jnp.clip(jnp.round((1 - ratio) * gb[:, 0] + ratio * gb[:, 2]),
                          0, w)
            y1 = jnp.clip(jnp.round((1 - ratio) * gb[:, 1] + ratio * gb[:, 3]),
                          0, h)
            x2 = jnp.clip(jnp.round(ratio * gb[:, 0] + (1 - ratio) * gb[:, 2]),
                          0, w)
            y2 = jnp.clip(jnp.round(ratio * gb[:, 1] + (1 - ratio) * gb[:, 3]),
                          0, h)
            m = ((xs >= x1[:, None, None]) & (xs <= x2[:, None, None])
                 & (ys >= y1[:, None, None]) & (ys <= y2[:, None, None]))
            return m & live[:, None, None]

        on = gt_valid & (lvl_of == li)
        m_ign = masks(r2, on)
        m_ctr = masks(r1, on)
        adj = gt_valid & ((lvl_of == li - 1) | (lvl_of == li + 1))
        adj_map = jnp.any(masks(r2, adj), axis=0)

        def body(g, a):
            a = jnp.where(m_ign[g], -1, a)
            return jnp.where(m_ctr[g], g + 1, a)

        a = jax.lax.fori_loop(0, num_g, body,
                              jnp.zeros((h, w), jnp.int32))
        if adjacent_ignore:
            a = jnp.where(adj_map, -1, a)
        out.append(a.reshape(-1))
    return jnp.concatenate(out)


def _rank_by_random(mask: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Random rank (0-based) of each True element among True elements; large
    rank for False elements."""
    rand = jax.random.uniform(rng, mask.shape)
    key = jnp.where(mask, rand, 2.0)
    order = jnp.argsort(key)
    ranks = jnp.empty_like(order).at[order].set(jnp.arange(mask.shape[0]))
    return jnp.where(mask, ranks, mask.shape[0] + 1)


class SampleMasks(NamedTuple):
    pos_mask: jnp.ndarray  # [N] bool — sampled positives
    neg_mask: jnp.ndarray  # [N] bool — sampled negatives


def random_sample_masks(
    assign: AssignResult,
    rng: jax.Array,
    num: int,
    pos_fraction: float,
) -> SampleMasks:
    """RandomSampler as fixed-shape masks (no gather) — used by RPN loss.

    Samples up to ``num * pos_fraction`` positives uniformly; negatives fill
    the remaining quota (num - #sampled_pos), as the reference does.
    """
    rng_p, rng_n = jax.random.split(rng)
    is_pos = assign.assigned_gt_inds > 0
    is_neg = assign.assigned_gt_inds == 0

    num_exp_pos = int(num * pos_fraction)
    pos_rank = _rank_by_random(is_pos, rng_p)
    pos_mask = is_pos & (pos_rank < num_exp_pos)

    num_sampled_pos = jnp.sum(pos_mask)
    num_exp_neg = num - num_sampled_pos
    neg_rank = _rank_by_random(is_neg, rng_n)
    neg_mask = is_neg & (neg_rank < num_exp_neg)
    return SampleMasks(pos_mask, neg_mask)


class SampleResult(NamedTuple):
    """Fixed-count (num) gathered sample for the RoI head."""

    inds: jnp.ndarray  # [num] int32 indices into candidate boxes
    is_pos: jnp.ndarray  # [num] bool
    is_valid: jnp.ndarray  # [num] bool (pos or neg actually sampled)


def random_sample_gather(
    assign: AssignResult,
    rng: jax.Array,
    num: int,
    pos_fraction: float,
) -> SampleResult:
    """RandomSampler returning exactly ``num`` gather indices (RoI head).

    Positives first (random subset up to the quota), then random negatives.
    If fewer than ``num`` candidates exist, the tail indices point at
    arbitrary boxes with ``is_valid=False`` (loss weight 0 downstream).
    """
    masks = random_sample_masks(assign, rng, num, pos_fraction)
    sel = masks.pos_mask | masks.neg_mask
    rng_t = jax.random.fold_in(rng, 17)
    tiebreak = jax.random.uniform(rng_t, sel.shape)
    priority = jnp.where(sel, tiebreak, 1e9)
    inds = jnp.argsort(priority)[:num].astype(jnp.int32)
    return SampleResult(inds, masks.pos_mask[inds], sel[inds])


def ohem_sample_gather(
    assign: AssignResult,
    per_candidate_loss: jnp.ndarray,
    num: int,
    pos_fraction: float,
) -> SampleResult:
    """OHEM sampler (reference: mmdet/core/bbox/samplers/ohem_sampler.py):
    instead of random selection, keep the candidates with the HIGHEST
    current loss — hardest positives up to the positive quota, hardest
    negatives for the rest. ``per_candidate_loss``: [N] (e.g. the bbox
    head's unreduced classification loss on every candidate).
    """
    is_pos = assign.assigned_gt_inds > 0
    is_neg = assign.assigned_gt_inds == 0

    num_exp_pos = int(num * pos_fraction)
    pos_loss = jnp.where(is_pos, per_candidate_loss, -jnp.inf)
    pos_rank = jnp.argsort(jnp.argsort(-pos_loss))  # rank 0 = hardest
    pos_mask = is_pos & (pos_rank < num_exp_pos)

    num_sampled_pos = jnp.sum(pos_mask)
    neg_loss = jnp.where(is_neg, per_candidate_loss, -jnp.inf)
    neg_rank = jnp.argsort(jnp.argsort(-neg_loss))
    neg_mask = is_neg & (neg_rank < (num - num_sampled_pos))

    sel = pos_mask | neg_mask
    # order selected first, hardest first
    priority = jnp.where(sel, -per_candidate_loss, jnp.inf)
    inds = jnp.argsort(priority)[:num].astype(jnp.int32)
    return SampleResult(inds, pos_mask[inds], sel[inds])


def iou_balanced_sample_gather(
    assign: AssignResult,
    rng: jax.Array,
    num: int,
    pos_fraction: float,
    floor_thr: float = -1.0,
    floor_fraction: float = 0.0,
    num_bins: int = 3,
    instance_balanced_pos: bool = True,
) -> SampleResult:
    """Libra R-CNN combined sampling (reference:
    mmdet/core/bbox/samplers/iou_balanced_neg_sampler.py:1 +
    instance_balanced_pos_sampler.py:1, wired by the CombinedSampler in
    configs/libra_rcnn/).

    Positives: with ``instance_balanced_pos``, drawn round-robin across gt
    instances (per-gt quota num_expected/num_gts, extras refilled) —
    statically expressed as a lexicographic (within-gt random rank, random)
    ordering. Negatives are drawn
    evenly from ``num_bins`` IoU intervals spanning
    ``[max(floor_thr, 0), max_iou]`` (``sample_via_interval``): each bin
    contributes up to ``num_expected / num_bins`` random candidates, and
    any shortfall is refilled uniformly from the remaining negatives — so
    hard (higher-IoU) negatives are over-represented vs. uniform sampling.
    With ``floor_thr >= 0``, ``floor_fraction`` of the quota comes uniformly
    from the below-floor negatives instead.

    Static-shape formulation: per-bin random ranking via one composite sort
    key (bin index major, random tiebreak minor, capped per-bin rank), then
    a second pass fills the shortfall.
    """
    rng_p, rng_n, rng_f = jax.random.split(rng, 3)
    is_pos = assign.assigned_gt_inds > 0
    is_neg = assign.assigned_gt_inds == 0
    n = is_pos.shape[0]

    num_exp_pos = int(num * pos_fraction)
    if instance_balanced_pos:
        # within-gt random rank, then round-robin across gts
        gts = jnp.where(is_pos, assign.assigned_gt_inds, 0)
        u = jax.random.uniform(rng_p, is_pos.shape)
        key = jnp.where(is_pos, gts.astype(jnp.float32) * 2.0 + u, jnp.inf)
        grank = jnp.argsort(jnp.argsort(key)).astype(jnp.int32)
        start = jax.ops.segment_min(
            jnp.where(is_pos, grank, jnp.iinfo(jnp.int32).max), gts,
            num_segments=n + 1)
        within = (grank - start[gts]).astype(jnp.float32)
        rr_key = jnp.where(is_pos, within + u * 0.5, jnp.inf)
        pos_rank = jnp.argsort(jnp.argsort(rr_key))
    else:
        pos_rank = _rank_by_random(is_pos, rng_p)
    pos_mask = is_pos & (pos_rank < num_exp_pos)
    num_sampled_pos = jnp.sum(pos_mask)
    num_exp_neg = num - num_sampled_pos

    iou = jnp.clip(assign.max_overlaps, 0.0, 1.0)
    floor0 = max(floor_thr, 0.0)
    if floor_thr >= 0:
        in_floor = is_neg & (iou < floor_thr) if floor_thr > 0 else (
            is_neg & (iou == 0))
        in_iou = is_neg & ~in_floor
        num_exp_iou = (num_exp_neg.astype(jnp.float32)
                       * (1.0 - floor_fraction)).astype(jnp.int32)
    else:
        in_floor = jnp.zeros_like(is_neg)
        in_iou = is_neg
        num_exp_iou = num_exp_neg

    # per-bin even sampling over [floor0, max_iou]
    max_iou = jnp.maximum(jnp.max(jnp.where(in_iou, iou, 0.0)), floor0 + 1e-6)
    width = (max_iou - floor0) / num_bins
    bin_idx = jnp.clip(((iou - floor0) / width).astype(jnp.int32),
                       0, num_bins - 1)
    per_bin = num_exp_iou // num_bins
    # rank within bin: composite key = bin * 2 + U(0,1); subtract bin start
    randk = jax.random.uniform(rng_n, iou.shape)
    key = jnp.where(in_iou, bin_idx.astype(jnp.float32) * 2.0 + randk, 1e9)
    grank = jnp.argsort(jnp.argsort(key)).astype(jnp.int32)
    seg_start = jax.ops.segment_min(
        jnp.where(in_iou, grank, jnp.iinfo(jnp.int32).max),
        jnp.where(in_iou, bin_idx, num_bins), num_segments=num_bins + 1)
    within = grank - seg_start[jnp.where(in_iou, bin_idx, num_bins)]
    bin_sel = in_iou & (within < per_bin)

    # floor-region uniform quota
    floor_rank = _rank_by_random(in_floor, rng_f)
    floor_sel = in_floor & (floor_rank < (num_exp_neg - num_exp_iou))

    # refill shortfall uniformly from unselected negatives
    short = num_exp_neg - jnp.sum(bin_sel) - jnp.sum(floor_sel)
    rest = is_neg & ~bin_sel & ~floor_sel
    rest_rank = _rank_by_random(rest, jax.random.fold_in(rng_n, 1))
    rest_sel = rest & (rest_rank < short)

    neg_mask = bin_sel | floor_sel | rest_sel
    sel = pos_mask | neg_mask
    tiebreak = jax.random.uniform(jax.random.fold_in(rng, 17), sel.shape)
    priority = jnp.where(sel, tiebreak, 1e9)
    inds = jnp.argsort(priority)[:num].astype(jnp.int32)
    return SampleResult(inds, pos_mask[inds], sel[inds])


def score_hlr_sample_gather(
    assign: AssignResult,
    rng: jax.Array,
    num: int,
    pos_fraction: float,
    neg_max_score: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    neg_ce_loss: jnp.ndarray,
    score_thr: float = 0.05,
    iou_thr: float = 0.5,
    k: float = 0.5,
    bias: float = 0.0,
):
    """ScoreHLRSampler (reference: mmdet/core/bbox/samplers/
    score_hlr_sampler.py:1, the PISA two-stage ISR-N sampler).

    Positives: random, as RandomSampler. Negatives: candidates whose max
    foreground score exceeds ``score_thr`` are grouped by NMS-match over
    their argmax-class DECODED boxes; Score-HLR = rank of
    ``num_valid - within_group_score_rank + score`` (descending); the
    ``num_expected`` most important are kept (shortfall refilled randomly
    from below-threshold negatives, which get the minimum HLR weight).
    Weights: ``(bias + (1-bias) * (up_bound - imp_rank)/up_bound)^k``,
    normalized so the weighted background CE sum equals the unweighted one.

    ``neg_max_score``: [N] detached max foreground softmax prob;
    ``pred_boxes``: [N, 4] argmax-class decoded boxes;
    ``neg_ce_loss``: [N] detached CE of each candidate vs background.
    Returns (SampleResult, neg_label_weights [num], 1 for positives).
    """
    from . import nms as nms_ops

    rng_p, rng_r = jax.random.split(rng)
    is_pos = assign.assigned_gt_inds > 0
    is_neg = assign.assigned_gt_inds == 0
    n = is_pos.shape[0]

    num_exp_pos = int(num * pos_fraction)
    pos_rank = _rank_by_random(is_pos, rng_p)
    pos_mask = is_pos & (pos_rank < num_exp_pos)
    num_expected = num - jnp.sum(pos_mask)  # negative quota

    valid = is_neg & (neg_max_score > score_thr)
    invalid = is_neg & ~valid
    num_valid = jnp.sum(valid)

    root = nms_ops.nms_match(pred_boxes, neg_max_score, iou_thr, valid=valid)
    seg = jnp.where(valid, root, n)
    key = seg.astype(jnp.float32) * 2.0 - jnp.where(valid, neg_max_score, 0.0)
    grank = jnp.argsort(jnp.argsort(key)).astype(jnp.int32)
    seg_start = jax.ops.segment_min(
        jnp.where(valid, grank, jnp.iinfo(jnp.int32).max), seg,
        num_segments=n + 1)
    within = (grank - seg_start[seg]).astype(jnp.float32)
    imp = jnp.where(valid, num_valid.astype(jnp.float32) - within
                    + neg_max_score, -jnp.inf)
    imp_rank = jnp.argsort(jnp.argsort(-imp)).astype(jnp.float32)
    hlr_sel = valid & (imp_rank < num_expected)

    num_hlr = jnp.minimum(num_valid, num_expected)
    rand_rank = _rank_by_random(invalid, rng_r)
    rand_sel = invalid & (rand_rank < (num_expected - num_hlr))
    neg_mask = hlr_sel | rand_sel

    up_bound = jnp.maximum(num_expected, num_valid).astype(jnp.float32)
    imp_w = (up_bound - imp_rank) / jnp.maximum(up_bound, 1.0)
    min_w = jnp.min(jnp.where(hlr_sel, imp_w, jnp.inf))
    min_w = jnp.where(jnp.isfinite(min_w), min_w, 1.0)
    w = jnp.where(hlr_sel, imp_w, jnp.where(rand_sel, min_w, 1.0))
    w = (bias + (1.0 - bias) * w) ** k
    sel_ce = jnp.where(neg_mask, neg_ce_loss, 0.0)
    ratio = jnp.sum(sel_ce) / jnp.maximum(jnp.sum(sel_ce * w), 1e-6)
    w = jnp.where(neg_mask, w * ratio, 1.0)

    sel = pos_mask | neg_mask
    tiebreak = jax.random.uniform(jax.random.fold_in(rng, 17), sel.shape)
    priority = jnp.where(sel, tiebreak, 1e9)
    inds = jnp.argsort(priority)[:num].astype(jnp.int32)
    sample = SampleResult(inds, pos_mask[inds], sel[inds])
    return sample, jnp.where(sample.is_pos, 1.0, w[inds])
