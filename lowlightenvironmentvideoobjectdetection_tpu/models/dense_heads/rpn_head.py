"""RPN head: module + target/loss + static-shape proposal generation.

Parity targets in the reference:
- RPNHead module: mmdetection/mmdet/models/dense_heads/rpn_head.py:17
  (3x3 conv + relu, 1x1 sigmoid cls, 1x1 4-reg per anchor).
- loss: mmdet/models/dense_heads/anchor_head.py:426 (BCE + SmoothL1(beta=1/9),
  averaged over the number of sampled anchors).
- get_bboxes: rpn_head.py _get_bboxes_single (per-level top nms_pre by score,
  decode, clip, NMS to nms_post) — here with fixed-size outputs + validity.

Everything is per-image; batch via vmap at the detector level.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import assigners, boxes as box_ops, losses, nms as nms_ops


class RPNHead(nn.Module):
    feat_channels: int = 512
    num_base_anchors: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: per-level [H, W, C] (or [..., H, W, C]). Returns per-level
        (cls_logits [..., H, W, A], bbox_pred [..., H, W, A*4])."""
        conv = nn.Conv(
            self.feat_channels, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            name="rpn_conv")
        cls_conv = nn.Conv(self.num_base_anchors, (1, 1), dtype=self.dtype,
                           name="rpn_cls")
        reg_conv = nn.Conv(self.num_base_anchors * 4, (1, 1), dtype=self.dtype,
                           name="rpn_reg")
        outs = []
        for x in feats:
            h = nn.relu(conv(x.astype(self.dtype)))
            outs.append((cls_conv(h), reg_conv(h)))
        return tuple(outs)


class RPNLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray


def rpn_loss(
    level_outs,
    level_anchors: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    img_shape,
    allowed_border: float = 0.0,
    num_samples: int = 256,
    pos_fraction: float = 0.5,
    pos_iou_thr: float = 0.7,
    neg_iou_thr: float = 0.3,
    min_pos_iou: float = 0.3,
    beta: float = 1.0 / 9.0,
) -> RPNLossOut:
    """Single-image RPN loss over all levels (concatenated, as the reference
    assigns over the flattened anchor list).

    ``img_shape`` = (h, w) of the un-padded image (may be traced scalars);
    with ``allowed_border=0`` only anchors fully inside it are assigned, the
    reference's ``anchor_inside_flags`` semantics.
    """
    cls_list, reg_list, anc_list = [], [], []
    for (cls, reg), anc in zip(level_outs, level_anchors):
        a = anc.shape[0]
        cls_list.append(cls.reshape(-1).astype(jnp.float32))
        reg_list.append(reg.reshape(-1, 4).astype(jnp.float32))
        anc_list.append(anc)
        assert cls_list[-1].shape[0] == a, (cls.shape, anc.shape)
    cls_all = jnp.concatenate(cls_list)
    reg_all = jnp.concatenate(reg_list, axis=0)
    anchors = jnp.concatenate(anc_list, axis=0)
    h, w = img_shape[0], img_shape[1]
    valid = (
        (anchors[:, 0] >= -allowed_border)
        & (anchors[:, 1] >= -allowed_border)
        & (anchors[:, 2] <= w + allowed_border)
        & (anchors[:, 3] <= h + allowed_border)
    )

    gt_labels = jnp.zeros((gt_boxes.shape[0],), jnp.int32)
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid,
        pos_iou_thr, neg_iou_thr, min_pos_iou, box_valid=valid,
    )
    masks = assigners.random_sample_masks(assign, rng, num_samples, pos_fraction)
    pos_w = masks.pos_mask.astype(jnp.float32)
    cls_w = pos_w + masks.neg_mask.astype(jnp.float32)
    avg = jnp.sum(cls_w)

    loss_cls = losses.binary_cross_entropy(
        cls_all, pos_w, weight=cls_w, avg_factor=avg
    )
    matched_gt = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[0] - 1)]
    targets = box_ops.bbox2delta(anchors, matched_gt)
    loss_bbox = losses.smooth_l1_loss(
        reg_all, targets, beta=beta, weight=pos_w[:, None], avg_factor=avg
    )
    return RPNLossOut(loss_cls, loss_bbox)


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # [num, 4]
    scores: jnp.ndarray  # [num]
    valid: jnp.ndarray  # [num] bool


def rpn_proposals(
    level_outs,
    level_anchors: Sequence[jnp.ndarray],
    img_shape,
    nms_pre: int = 6000,
    nms_post: int = 600,
    iou_threshold: float = 0.7,
) -> Proposals:
    """Generate fixed-count proposals for one image.

    Per level: top nms_pre anchors by score, decode, clip to img_shape, then
    a single fixed-size NMS over the level-concatenated candidates
    (nms_across_levels=False in the reference configs, but DC5 has one level;
    multi-level NMS-per-level can reuse this function per level).
    """
    all_scores, all_boxes = [], []
    for (cls, reg), anc in zip(level_outs, level_anchors):
        scores = jax.nn.sigmoid(cls.reshape(-1).astype(jnp.float32))
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        # decode ALL anchors (cheap vector math) instead of top_k + row
        # gathers (TPU row gathers of [k, 4] cost milliseconds); nms_fixed
        # sorts and keeps the top ``nms_pre`` itself
        decoded = box_ops.delta2bbox(anc, deltas, max_shape=img_shape)
        all_scores.append(scores)
        all_boxes.append(decoded)
    scores = jnp.concatenate(all_scores)
    cand = jnp.concatenate(all_boxes, axis=0)
    res = nms_ops.nms_fixed(cand, scores, iou_threshold, nms_post,
                            pre_top_k=nms_pre)
    return Proposals(res.boxes, res.scores, res.valid)
