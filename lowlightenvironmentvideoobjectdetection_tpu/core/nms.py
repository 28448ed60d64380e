"""Fixed-shape, fully on-device NMS.

Replaces the reference's native mmcv kernels (``nms``/``batched_nms`` used by
mmdet/core/post_processing/bbox_nms.py:7 ``multiclass_nms`` and RPN
``get_bboxes``) with an XLA formulation: a ``fori_loop`` that performs
``max_out`` pick-and-suppress rounds. Each round is O(N) vector work on the
VPU, so total cost is O(max_out * N) — no host round-trip, no dynamic shapes,
batchable under vmap. Suppressed/empty slots are reported via a validity mask
instead of a shorter tensor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # [max_out, 4]
    scores: jnp.ndarray  # [max_out]
    inds: jnp.ndarray  # [max_out] int32 indices into the input
    valid: jnp.ndarray  # [max_out] bool


def _pairwise_iou_one(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    area2 = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    return inter / jnp.maximum(area1 + area2 - inter, 1e-6)


def nms_fixed_loop(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> NMSResult:
    """Reference implementation: ``max_out`` sequential pick-and-suppress
    rounds (one argmax + one IoU row per round). Exact greedy semantics but
    latency-bound on TPU — kept as the golden model for tests and as a
    fallback for very large N where the matrix variant's [K, K] IoU would
    not fit."""
    n = boxes.shape[0]
    live = scores.astype(jnp.float32)
    if valid is not None:
        live = jnp.where(valid, live, NEG_INF)

    out_inds = jnp.zeros((max_out,), jnp.int32)
    out_valid = jnp.zeros((max_out,), bool)

    def body(i, carry):
        live, out_inds, out_valid = carry
        best = jnp.argmax(live).astype(jnp.int32)
        best_score = live[best]
        ok = best_score > NEG_INF / 2
        out_inds = out_inds.at[i].set(best)
        out_valid = out_valid.at[i].set(ok)
        iou = _pairwise_iou_one(boxes[best], boxes)
        suppress = (iou > iou_threshold) | (
            jnp.arange(n) == best
        )  # self-suppress even for degenerate boxes
        live = jnp.where(ok & suppress, NEG_INF, live)
        return live, out_inds, out_valid

    live, out_inds, out_valid = jax.lax.fori_loop(
        0, max_out, body, (live, out_inds, out_valid)
    )
    return NMSResult(
        boxes[out_inds], scores[out_inds] * out_valid, out_inds, out_valid
    )


# Cap on the sorted candidate set entering the IoU-matrix fixpoint.
# 6144 covers the reference's rpn nms_pre=6000 (faster_rcnn_r50_dc5.py:25-29)
# exactly; the [K, K] bf16/f32 relation matrix peaks at ~150 MB transient,
# fine on 16 GB chips. Callers pass pre_top_k to trade this down (the
# perf-tuned SELSA default uses 2000).
_MATRIX_NMS_MAX_K = 6144


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    pre_top_k: Optional[int] = None,
) -> NMSResult:
    """Greedy NMS with exactly ``max_out`` output slots — matrix fixpoint
    formulation.

    Semantics match mmcv ``nms`` (sort by score, greedily suppress IoU>thr).
    Instead of ``max_out`` sequential rounds, this sorts the (top-K)
    candidates, builds the upper-triangular IoU>thr relation O once, and
    iterates ``keep_i <- alive_i & ~any_{j<i}(O_ij & keep_j)`` to its unique
    fixpoint — which is exactly the greedy solution (induction over score
    rank). Convergence takes one iteration per suppression-chain level
    (typically <6), each a cheap [K, K] masked reduction on the VPU, so the
    sequential depth drops from 300 to ~6.
    """
    n = boxes.shape[0]
    live = scores.astype(jnp.float32)
    if valid is not None:
        live = jnp.where(valid, live, NEG_INF)

    k = min(n, pre_top_k or _MATRIX_NMS_MAX_K, _MATRIX_NMS_MAX_K)
    # one multi-operand sort instead of top_k + row gathers: TPU gathers of
    # [k, 4] rows cost milliseconds, a joint sort is ~0.1 ms
    neg, order, sx1, sy1, sx2, sy2 = jax.lax.sort(
        (-live, jnp.arange(n, dtype=jnp.int32),
         boxes[:, 0].astype(jnp.float32), boxes[:, 1].astype(jnp.float32),
         boxes[:, 2].astype(jnp.float32), boxes[:, 3].astype(jnp.float32)),
        num_keys=1,
    )
    neg, order = neg[:k], order[:k]
    top_scores = -neg
    x1, y1, x2, y2 = sx1[:k], sy1[:k], sx2[:k], sy2[:k]
    alive = top_scores > NEG_INF / 2

    # The suppression relation O_ij ("strictly higher-ranked j overlaps i")
    # is consumed ONLY bitwise, so it is built directly as packed uint32
    # bitsets over j: [K, W=ceil(K/32)] words (~0.5 MB at K=2048) instead of
    # a [K, K] bool/f32 matrix (4-16 MB). XLA fuses the whole broadcast IoU
    # chain into the pack reduction — the [K, K] intermediates never hit
    # HBM, and each fixpoint iteration touches 32x fewer bytes.
    w = (k + 31) // 32
    kp = w * 32
    pad = kp - k

    def padded(v, fill):
        return jnp.pad(v, (0, pad), constant_values=fill) if pad else v

    px1, py1 = padded(x1, 1.0), padded(y1, 1.0)
    px2, py2 = padded(x2, 0.0), padded(y2, 0.0)  # zero-area pads
    palive = padded(alive, False)
    bit_w = jnp.left_shift(
        jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))

    iw = jnp.maximum(
        jnp.minimum(x2[:, None], px2[None, :])
        - jnp.maximum(x1[:, None], px1[None, :]), 0.0)
    ih = jnp.maximum(
        jnp.minimum(y2[:, None], py2[None, :])
        - jnp.maximum(y1[:, None], py1[None, :]), 0.0)
    inter = iw * ih
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    parea = padded(area, 0.0)
    iou = inter / jnp.maximum(area[:, None] + parea[None, :] - inter, 1e-6)
    tri = jnp.arange(kp)[None, :] < jnp.arange(k)[:, None]
    overlap = (iou > iou_threshold) & tri & palive[None, :]
    bits = jnp.sum(
        overlap.reshape(k, w, 32) * bit_w[None, None, :],
        axis=-1, dtype=jnp.uint32)  # [K, W]

    def pack_keep(kb):  # [K] bool -> [W] uint32
        return jnp.sum(
            padded(kb, False).reshape(w, 32) * bit_w[None, :],
            axis=-1, dtype=jnp.uint32)

    def cond(carry):
        keep, prev, it = carry
        return jnp.any(keep != prev) & (it < k)

    def body(carry):
        keep, _, it = carry
        kw = pack_keep(keep)
        new = alive & ~jnp.any((bits & kw[None, :]) != 0, axis=1)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (alive, jnp.zeros_like(alive), jnp.asarray(0))
    )

    # first max_out kept candidates in score order, assembled by 1-D
    # scatters of the sorted columns (no row gathers)
    kept_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept
    src = jnp.clip(jnp.where(keep, kept_rank, max_out), 0, max_out)

    def place(col, fill):
        return jnp.full((max_out + 1,), fill, col.dtype).at[src].set(
            jnp.where(keep, col, fill), mode="drop"
        )[:max_out]

    out_inds = place(order.astype(jnp.int32), 0)
    out_valid = jnp.zeros((max_out + 1,), bool).at[src].set(
        keep, mode="drop"
    )[:max_out]
    out_boxes = jnp.stack(
        [place(x1, 0.0), place(y1, 0.0), place(x2, 0.0), place(y2, 0.0)],
        axis=-1,
    )
    out_scores = place(top_scores, 0.0) * out_valid
    return NMSResult(out_boxes, out_scores, out_inds, out_valid)


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    pre_top_k: Optional[int] = None,
) -> NMSResult:
    """Class-aware NMS via the coordinate-offset trick (mmcv ``batched_nms``):
    boxes of different ``idxs`` never overlap, so one ``nms_fixed`` call does
    per-class NMS jointly. ``pre_top_k`` bounds the sorted candidate window
    (the [K, K] IoU matrix is the dominant cost)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(jnp.float32) * max_coord
    shifted = boxes + offsets[:, None]
    res = nms_fixed(shifted, scores, iou_threshold, max_out, valid=valid,
                    pre_top_k=pre_top_k)
    # un-shift instead of re-gathering full box rows (1-D offset gather only)
    out_boxes = res.boxes - offsets[res.inds][:, None] * res.valid[:, None]
    return NMSResult(out_boxes, res.scores, res.inds, res.valid)


class DetResult(NamedTuple):
    boxes: jnp.ndarray  # [max_num, 4]
    scores: jnp.ndarray  # [max_num]
    labels: jnp.ndarray  # [max_num] int32
    valid: jnp.ndarray  # [max_num] bool


def multiclass_nms(
    multi_bboxes: jnp.ndarray,
    multi_scores: jnp.ndarray,
    score_thr: float,
    iou_threshold: float,
    max_num: int,
    box_valid: Optional[jnp.ndarray] = None,
    pre_top_k: Optional[int] = None,
) -> DetResult:
    """Reference ``multiclass_nms`` (mmdet bbox_nms.py:7) with fixed shapes.

    multi_bboxes: [N, 4] (shared) or [N, C*4] (per class).
    multi_scores: [N, C+1] — last column is background and is dropped.
    ``pre_top_k``: sorted-candidate window for the matrix NMS; None = the
    global ``_MATRIX_NMS_MAX_K`` cap. With N*C candidates (e.g. 300 rois x
    30 classes = 9000) the window size drives the whole NMS cost — round 2's
    cap bump from 2048 to 6144 for RPN parity silently tripled this step and
    cost the streaming bench 33% end-to-end (A/B'd round-3); hot callers
    should pass ~2048.
    """
    n, num_cols = multi_scores.shape
    num_classes = num_cols - 1
    scores = multi_scores[:, :num_classes]  # [N, C]
    if multi_bboxes.shape[-1] > 4:
        boxes = multi_bboxes.reshape(n, num_classes, 4)
    else:
        boxes = jnp.broadcast_to(multi_bboxes[:, None, :], (n, num_classes, 4))

    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = scores.reshape(-1)
    labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
    cand_valid = flat_scores > score_thr
    if box_valid is not None:
        cand_valid &= jnp.repeat(box_valid, num_classes)

    res = batched_nms(
        flat_boxes, flat_scores, labels, iou_threshold, max_num,
        valid=cand_valid, pre_top_k=pre_top_k,
    )
    return DetResult(res.boxes, res.scores, labels[res.inds], res.valid)


def nms_match(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Group boxes into NMS suppression groups (mmcv.ops.nms_match).

    Returns [N] int32: for each box, the index of the kept (group-root) box
    that suppresses it — a kept box maps to itself; invalid boxes map to -1.
    The reference's OHEM machinery uses this to share loss within duplicate
    groups. Same fixpoint formulation as nms_fixed, but keeps the full [N]
    keep mask instead of compacting to max_out slots.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    live = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)
    alive = live > NEG_INF / 2

    x1, y1, x2, y2 = (boxes[:, i].astype(jnp.float32) for i in range(4))
    iw = jnp.maximum(jnp.minimum(x2[:, None], x2[None, :])
                     - jnp.maximum(x1[:, None], x1[None, :]), 0.0)
    ih = jnp.maximum(jnp.minimum(y2[:, None], y2[None, :])
                     - jnp.maximum(y1[:, None], y1[None, :]), 0.0)
    inter = iw * ih
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-6)

    # rank by score (stable by index); j "outranks" i if better score
    rank = jnp.argsort(jnp.argsort(-live))
    outranks = rank[None, :] < rank[:, None]
    overlap = (iou >= iou_threshold) & outranks & alive[None, :]

    def cond(carry):
        keep, prev, it = carry
        return jnp.any(keep != prev) & (it < n)

    def body(carry):
        keep, _, it = carry
        new = alive & ~jnp.any(overlap & keep[None, :], axis=1)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (alive, jnp.zeros_like(alive), jnp.asarray(0)))

    # each suppressed box matches its best-ranked kept suppressor
    cand = keep[None, :] & (iou >= iou_threshold) & alive[:, None]
    cand_rank = jnp.where(cand, rank[None, :], n + 1)
    root = jnp.argmin(cand_rank, axis=1).astype(jnp.int32)
    has = jnp.any(cand, axis=1)
    root = jnp.where(keep, jnp.arange(n, dtype=jnp.int32), root)
    return jnp.where(alive & (has | keep), root, -1)
