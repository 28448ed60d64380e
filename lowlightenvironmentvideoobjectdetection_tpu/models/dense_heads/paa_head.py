"""PAA: Probabilistic Anchor Assignment.

Parity target: mmdetection/mmdet/models/dense_heads/paa_head.py:45-470 and
configs/paa/paa_r50_fpn_1x_coco.py —
- ATSS-style tower (shared convs, cls + reg + IoU branch; the centerness
  branch doubles as the IoU predictor);
- first match: MaxIoU candidates (pos_iou_thr=0.1 in the config);
- per candidate, an assignment score = focal cls loss + GIoU loss of the
  DECODED box (paa_head.py get_pos_loss, :201-256);
- per gt: top-k (topk=4) lowest-score candidates per level, then a
  2-component 1-D Gaussian mixture is fit on the scores and the
  lower-mean component's members become the final positives
  (paa_reassign, :257-370 — sklearn GMM there; a fixed-iteration
  vectorized EM here, same separation);
- losses: focal cls, GIoU weighted by the IoU target, BCE on the IoU
  branch against the decoded-box IoU (loss, :86-199).

TPU-native: the per-gt python GMM loop becomes one batched EM over a
[G, L*topk] padded candidate matrix — everything on device.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, losses, nms as nms_ops
from .atss_head import ATSS, ATSSHead, atss_anchors, atss_decode

PAA_STRIDES = (8, 16, 32, 64, 128)
STDS = (0.1, 0.1, 0.2, 0.2)


class PAA(ATSS):
    """Same assembly as ATSS; the assignment (below) is what differs
    (mmdet/models/detectors/paa.py)."""


paa_decode = atss_decode


class PAALossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_iou: jnp.ndarray


def _giou(a, b):
    """Aligned GIoU [N]."""
    x1 = jnp.maximum(a[:, 0], b[:, 0])
    y1 = jnp.maximum(a[:, 1], b[:, 1])
    x2 = jnp.minimum(a[:, 2], b[:, 2])
    y2 = jnp.minimum(a[:, 3], b[:, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    union = jnp.maximum(area_a + area_b - inter, 1e-6)
    iou = inter / union
    ex1 = jnp.minimum(a[:, 0], b[:, 0])
    ey1 = jnp.minimum(a[:, 1], b[:, 1])
    ex2 = jnp.maximum(a[:, 2], b[:, 2])
    ey2 = jnp.maximum(a[:, 3], b[:, 3])
    enc = jnp.maximum(ex2 - ex1, 0) * jnp.maximum(ey2 - ey1, 0)
    return iou - (enc - union) / jnp.maximum(enc, 1e-6)


def _gmm_pos_split(scores: jnp.ndarray, valid: jnp.ndarray,
                   iters: int = 10) -> jnp.ndarray:
    """Batched 2-component 1-D GMM EM over per-gt candidate scores.

    scores: [G, K] (lower = better candidate); valid: [G, K].
    Returns a [G, K] bool mask of PAA's positives per the reference's
    separation scheme (c) (paa_head.py gmm_separation_scheme:370-399):
    among candidates assigned to the foreground (lower-mean) component, keep
    those whose loss does not exceed the loss of the component's
    maximum-likelihood member (the fg mode) — `pos_inds_gmm[fgs][:thr + 1]`
    over loss-sorted candidates, NOT the whole fg component.

    The reference inits sklearn's GMM with means (min, max), weights .5,
    unit precisions and identifies fg as component 0 (the min-initialized
    one); the fixed-iteration EM here starts from the same init, and fg is
    the lower-mean component after fitting — identical on separated data.
    """
    big = 1e8
    s = jnp.where(valid, scores, big)
    smin = jnp.min(s, axis=1, keepdims=True)
    smax = jnp.max(jnp.where(valid, s, -big), axis=1, keepdims=True)
    smax = jnp.maximum(smax, smin + 1e-3)
    mu = jnp.concatenate([smin, smax], axis=1)  # [G, 2]
    var = jnp.full_like(mu, 1.0)
    pi = jnp.full_like(mu, 0.5)
    vf = valid.astype(jnp.float32)

    def em(_, carry):
        mu, var, pi = carry
        # E step: responsibilities [G, K, 2]
        d2 = (s[:, :, None] - mu[:, None, :]) ** 2
        logp = (-0.5 * d2 / var[:, None, :]
                - 0.5 * jnp.log(2 * jnp.pi * var[:, None, :])
                + jnp.log(jnp.clip(pi[:, None, :], 1e-8)))
        r = jax.nn.softmax(logp, axis=-1) * vf[:, :, None]
        # M step
        nk = jnp.sum(r, axis=1) + 1e-6  # [G, 2]
        mu = jnp.sum(r * s[:, :, None], axis=1) / nk
        var = jnp.sum(r * (s[:, :, None] - mu[:, None, :]) ** 2, axis=1) / nk
        var = jnp.maximum(var, 1e-4)
        pi = nk / jnp.maximum(jnp.sum(nk, axis=1, keepdims=True), 1e-6)
        return mu, var, pi

    mu, var, pi = jax.lax.fori_loop(0, iters, em, (mu, var, pi))
    lo = jnp.argmin(mu, axis=1)  # index of the low-mean component [G]
    d2 = (s[:, :, None] - mu[:, None, :]) ** 2
    logp = (-0.5 * d2 / var[:, None, :]
            - 0.5 * jnp.log(2 * jnp.pi * var[:, None, :])
            + jnp.log(jnp.clip(pi[:, None, :], 1e-8)))
    assign = jnp.argmax(logp, axis=-1)  # [G, K]
    fg = (assign == lo[:, None]) & valid
    # scheme (c): threshold at the fg mode's loss (sklearn score_samples ->
    # topk(1) in the reference); mixture log-likelihood = logsumexp over the
    # weighted component log-probs.
    loglik = jax.scipy.special.logsumexp(logp, axis=-1)  # [G, K]
    ll_fg = jnp.where(fg, loglik, -jnp.inf)
    thr = jnp.take_along_axis(
        s, jnp.argmax(ll_fg, axis=1)[:, None], axis=1)  # [G, 1]
    return fg & (s <= thr) & jnp.any(fg, axis=1, keepdims=True)


def paa_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
             topk: int = 4, first_match_iou: float = 0.1) -> PAALossOut:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    level_anchors = atss_anchors(shapes)
    anchors = jnp.concatenate(level_anchors, axis=0)
    A = anchors.shape[0]
    G = gt_boxes.shape[0]
    L = len(level_anchors)
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32)
         for c, _, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r, _ in level_outs])
    iou_all = jnp.concatenate(
        [t.reshape(-1).astype(jnp.float32) for _, _, t in level_outs])

    iou_mat = box_ops.bbox_overlaps(anchors, gt_boxes)  # [A, G]
    cand = (iou_mat >= first_match_iou) & gt_valid[None, :]

    # per-candidate assignment score: focal cls + GIoU of the decoded box
    decoded = jax.lax.stop_gradient(
        box_ops.delta2bbox(anchors, reg_all, stds=STDS))
    p = jax.nn.sigmoid(jax.lax.stop_gradient(cls_all))  # [A, C]
    safe_lab = jnp.clip(gt_labels, 0, num_classes - 1)
    p_lab = p[:, safe_lab]  # [A, G]
    focal = -0.25 * ((1 - p_lab) ** 2.0) * jnp.log(jnp.clip(p_lab, 1e-8))
    giou_cost = jax.vmap(
        lambda gb: 1.0 - _giou(decoded, jnp.broadcast_to(gb, decoded.shape)),
        out_axes=1,
    )(gt_boxes)  # [A, G]
    score = jnp.where(cand, focal + giou_cost, 1e8)

    # per gt: topk lowest-score candidates per level -> [G, L*topk]
    sel_scores, sel_inds, sel_valid = [], [], []
    start = 0
    for la in level_anchors:
        n = la.shape[0]
        k = min(topk, n)
        sc = score[start:start + n]  # [n, G]
        neg_s, idx = jax.lax.top_k(-sc.T, k)  # [G, k]
        sel_scores.append(-neg_s)
        sel_inds.append(idx + start)
        sel_valid.append(-neg_s < 1e7)
        start += n
    cand_scores = jnp.concatenate(sel_scores, axis=1)  # [G, L*k]
    cand_inds = jnp.concatenate(sel_inds, axis=1)
    cand_valid = jnp.concatenate(sel_valid, axis=1) & gt_valid[:, None]

    pos_mask_gk = _gmm_pos_split(cand_scores, cand_valid)  # [G, K]

    # scatter back to anchors: each anchor positive for its best (lowest
    # score) gt among those whose GMM kept it
    pos_pairs = jnp.zeros((A, G), bool)
    gidx = jnp.broadcast_to(jnp.arange(G)[:, None], cand_inds.shape)
    pos_pairs = pos_pairs.at[cand_inds.reshape(-1),
                             gidx.reshape(-1)].max(
        pos_mask_gk.reshape(-1))
    score_sel = jnp.where(pos_pairs, score, 1e8)
    best_gt = jnp.argmin(score_sel, axis=1)  # [A]
    pos = jnp.any(pos_pairs, axis=1)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    onehot = jax.nn.one_hot(
        jnp.clip(gt_labels[best_gt], 0, num_classes - 1), num_classes
    ) * pos[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, avg_factor=num_pos)

    matched = gt_boxes[best_gt]
    dec_live = box_ops.delta2bbox(anchors, reg_all, stds=STDS)
    iou_tgt = jax.lax.stop_gradient(
        jnp.sum(jnp.where(pos_pairs, iou_mat, 0.0) *
                jax.nn.one_hot(best_gt, G), axis=1))
    # GIoU reg weighted by the IoU target (paa loss :193-196)
    giou_l = (1.0 - _giou(dec_live, matched)) * pos * jnp.maximum(iou_tgt, 1e-6)
    loss_bbox = jnp.sum(giou_l) / jnp.maximum(jnp.sum(iou_tgt * pos), 1e-6)
    # IoU branch BCE vs decoded-box IoU
    dec_iou = jax.lax.stop_gradient(
        jnp.clip(jnp.sum(box_ops.bbox_overlaps(dec_live, gt_boxes)
                         * jax.nn.one_hot(best_gt, G), axis=1), 0.0, 1.0))
    loss_iou = losses.binary_cross_entropy(
        iou_all, dec_iou, weight=pos.astype(jnp.float32), avg_factor=num_pos)
    return PAALossOut(loss_cls, loss_bbox, loss_iou)
