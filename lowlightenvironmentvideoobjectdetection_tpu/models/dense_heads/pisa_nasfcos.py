"""PISA (ISR-P + CARL) retina/ssd loss variants and NASFCOS.

Parity targets:
- PISARetinaHead (mmdetection/mmdet/models/dense_heads/pisa_retinanet_head.py
  :139) and PISASSDHead (pisa_ssd_head.py): RetinaNet/SSD towers with
  Prime-Sample-Attention losses — ISR-P (mmdet/core/bbox/samplers/../
  isr_p: positives re-weighted by their IoU-hierarchy rank within each
  class: w = ((1 - r/n_max) * bias + 1)^k) and CARL
  (classification-aware regression loss: reg loss scaled by the sigmoid
  class score so cls and reg reinforce each other).
- NASFCOSHead (nasfcos_head.py:75): FCOS with the searched head tower —
  architecturally FCOS with a different conv arrangement; reuse FCOSHead
  (the search result is a tower config, not new math) with its loss/decode.

TPU-native: the per-class rank loop is a masked double-argsort.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, losses
from .fcos_head import FCOS, FCOSHead, fcos_decode, fcos_loss  # noqa: F401
from .retina_head import RetinaNet  # noqa: F401 — PISA-Retina tower


class NASFCOS(FCOS):
    """NAS-FCOS detector: the searched tower degenerates to the FCOS tower
    here (nasfcos_head.py:75 — same branch structure, searched convs)."""


nasfcos_loss = fcos_loss
nasfcos_decode = fcos_decode


class PISALossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_carl: jnp.ndarray


def isr_p_weights(labels: jnp.ndarray, ious: jnp.ndarray, pos: jnp.ndarray,
                  num_classes: int, bias: float = 0.0, k: float = 2.0):
    """Importance-based sample reweighting (ISR-P).

    Within each class, positives are ranked by IoU with their matched gt
    (rank 0 = highest); weight = ((1 - rank / n_pos) * bias_term)^k
    normalized to keep the total loss scale (isr_p in mmdet
    core/bbox/samplers/score_hlr_sampler-adjacent utils)."""
    # within-class IoU rank via ONE composite-key sort (no per-class loop):
    # global order by (class, -iou, only positives), then subtract each
    # class segment's start position
    lab = jnp.where(pos, jnp.clip(labels, 0, num_classes - 1), num_classes)
    key = lab.astype(jnp.float32) * 4.0 - jnp.clip(ious, 0.0, 1.0)
    grank = jnp.argsort(jnp.argsort(key)).astype(jnp.int32)
    seg_start = jax.ops.segment_min(grank, lab, num_segments=num_classes + 1)
    rank = (grank - seg_start[lab]).astype(jnp.float32)
    cls_n = jax.ops.segment_sum(jnp.ones_like(grank), lab,
                                num_segments=num_classes + 1)
    n = jnp.maximum(cls_n[lab], 1).astype(jnp.float32)
    hlr = 1.0 - rank / n
    w = (bias + (1 - bias) * hlr) ** k
    # normalize so the summed positive weight is unchanged
    tot = jnp.maximum(jnp.sum(jnp.where(pos, w, 0.0)), 1e-6)
    npos = jnp.maximum(jnp.sum(pos), 1.0)
    return jnp.where(pos, w * npos / tot, 1.0)


def pisa_retina_loss(
    level_outs,
    level_anchors: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    img_shape,
    num_classes: int,
    carl_k: float = 1.0,
    carl_bias: float = 0.2,
) -> PISALossOut:
    """RetinaNet assignment + focal cls with ISR-P positive reweighting +
    CARL regression (pisa_retinanet_head.py:16-154)."""
    from ...core import assigners

    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32) for c, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r in level_outs])
    anchors = jnp.concatenate(list(level_anchors), axis=0)
    h, w = img_shape[0], img_shape[1]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] <= w) & (anchors[:, 3] <= h))
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid, 0.5, 0.4,
        min_pos_iou=0.0, box_valid=inside)
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    isr_w = isr_p_weights(assign.labels, assign.max_overlaps, pos,
                          num_classes)
    onehot = jax.nn.one_hot(jnp.clip(assign.labels, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    weight = ((pos | neg).astype(jnp.float32) * jnp.where(pos, isr_w, 1.0)
              )[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, weight=weight,
                                         avg_factor=num_pos)

    matched = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                gt_boxes.shape[0] - 1)]
    tgt = box_ops.bbox2delta(anchors, matched)
    l1 = jnp.sum(jnp.abs(reg_all - tgt), axis=-1)
    loss_bbox = jnp.sum(l1 * pos) / num_pos

    # CARL: reg loss scaled by the (stop-grad-free) class score so the
    # classifier is pushed to agree with localization quality
    p_lab = jnp.take_along_axis(
        jax.nn.sigmoid(cls_all),
        jnp.clip(assign.labels, 0, num_classes - 1)[:, None], axis=1)[:, 0]
    carl_w = carl_bias + (1 - carl_bias) * p_lab
    loss_carl = carl_k * jnp.sum(l1 * carl_w * pos) / num_pos
    return PISALossOut(loss_cls, loss_bbox, loss_carl)
