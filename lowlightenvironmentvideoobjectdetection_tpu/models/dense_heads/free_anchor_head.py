"""FreeAnchor: learning-to-match anchor assignment on a RetinaNet tower.

Parity target: mmdetection/mmdet/models/dense_heads/free_anchor_retina_head.py
:40-270 and configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py —
- per gt, a bag of pre_anchor_topk=50 anchors by IoU;
- positive bag loss: mean-max over the bag of
  P_cls(label) * exp(-smooth_l1(delta_pred, delta_target)) with the
  1/(1-p) soft-weighting, then alpha * BCE(bag_prob, 1);
- negative loss: focal-style (p^gamma * BCE(p, 0)) on
  p = P_cls * (1 - P{anchor matched}), where P{matched}[j, c] is the max
  over same-class gts of the IoU-ramp ((IoU - t1)/(t2_i - t1), t1=0.6,
  t2_i = per-gt max IoU) of the DECODED predicted boxes;
- delta coder stds (0.1, 0.1, 0.2, 0.2), SmoothL1 beta=0.11 weight 0.75.

TPU-native: padded gts are masked; the sparse per-class max becomes a dense
[G, A] x one-hot max — static shapes, no host sync.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ...core import boxes as box_ops

STDS = (0.1, 0.1, 0.2, 0.2)


class FreeAnchorLossOut(NamedTuple):
    positive_bag_loss: jnp.ndarray
    negative_bag_loss: jnp.ndarray


def _iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[Ga, 4] x [Gb, 4] -> [Ga, Gb]."""
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def free_anchor_loss(
    level_outs,
    level_anchors: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
    pre_anchor_topk: int = 50,
    bbox_thr: float = 0.6,
    gamma: float = 2.0,
    alpha: float = 0.5,
    beta: float = 0.11,
    bbox_loss_weight: float = 0.75,
) -> FreeAnchorLossOut:
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32) for c, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r in level_outs])
    anchors = jnp.concatenate(list(level_anchors), axis=0)
    cls_prob = jax.nn.sigmoid(cls_all)  # [A, C]
    eps = 1e-12

    # --- negative branch: P{a_j matched} over DECODED predictions ---------
    pred_boxes = jax.lax.stop_gradient(
        box_ops.delta2bbox(anchors, reg_all, stds=STDS))
    obj_iou = _iou_matrix(gt_boxes, pred_boxes)  # [G, A]
    t1 = bbox_thr
    t2 = jnp.clip(jnp.max(obj_iou, axis=1, keepdims=True), t1 + 1e-12, None)
    obj_prob = jnp.clip((obj_iou - t1) / (t2 - t1), 0.0, 1.0)
    obj_prob = obj_prob * gt_valid[:, None]
    onehot_g = jax.nn.one_hot(jnp.clip(gt_labels, 0, num_classes - 1),
                              num_classes) * gt_valid[:, None]  # [G, C]
    # image_box_prob[j, c] = max over gts of class c of obj_prob[i, j]
    image_box_prob = jnp.max(
        obj_prob[:, :, None] * onehot_g[:, None, :], axis=0)  # [A, C]

    neg_p = jnp.clip(cls_prob * (1 - image_box_prob), eps, 1 - eps)
    negative = (1 - alpha) * jnp.sum(
        neg_p ** gamma * (-jnp.log(1 - neg_p)))

    # --- positive bags ----------------------------------------------------
    quality = _iou_matrix(gt_boxes, anchors)  # [G, A]
    k = min(pre_anchor_topk, anchors.shape[0])
    _, matched = jax.lax.top_k(quality, k)  # [G, K]
    m_anchors = anchors[matched]  # [G, K, 4]
    m_cls = cls_prob[matched]  # [G, K, C]
    m_cls_prob = jnp.take_along_axis(
        m_cls, jnp.clip(gt_labels, 0, num_classes - 1)[:, None, None]
        .repeat(k, axis=1), axis=2)[..., 0]  # [G, K]
    tgt = box_ops.bbox2delta(
        m_anchors.reshape(-1, 4),
        jnp.repeat(gt_boxes, k, axis=0), stds=STDS).reshape(-1, k, 4)
    pred_d = reg_all[matched]
    diff = jnp.abs(pred_d - tgt)
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    m_box_prob = jnp.exp(-bbox_loss_weight * jnp.sum(sl1, axis=-1))  # [G, K]

    m_prob = m_cls_prob * m_box_prob
    weight = 1.0 / jnp.clip(1 - m_prob, 1e-12, None)
    weight = weight / jnp.sum(weight, axis=1, keepdims=True)
    bag_prob = jnp.sum(weight * m_prob, axis=1)  # [G]
    pos_per_gt = alpha * (-jnp.log(jnp.clip(bag_prob, eps, 1.0)))
    num_pos = jnp.maximum(jnp.sum(gt_valid), 1.0)
    positive = jnp.sum(pos_per_gt * gt_valid) / num_pos

    negative = negative / jnp.maximum(num_pos * pre_anchor_topk, 1.0)
    return FreeAnchorLossOut(positive, negative)
