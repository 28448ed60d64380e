"""ATSS: Adaptive Training Sample Selection detector.

Parity target: mmdetection/mmdet/models/dense_heads/atss_head.py — RetinaNet
architecture (1 anchor/location here, as the ATSS paper) + centerness branch;
the assigner picks, per gt, the top-k closest anchors per level by center
distance, and thresholds their IoU at mean+std of that candidate set
(mmdet/core/bbox/assigners/atss_assigner.py), requiring centers inside
the gt. Static-shape masked formulation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

ATSS_STRIDES = (8, 16, 32, 64, 128)


class ATSSHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs = {b: [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f"{b}_conv{i}")
                     for i in range(self.stacked_convs)]
                 for b in ("cls", "reg")}
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="atss_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="atss_reg")
        ctr_out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="atss_centerness")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c), reg_out(r), ctr_out(r)))
        return tuple(outs)


def atss_anchors(shapes, scale: float = 8.0):
    """One square anchor per location: side = scale * stride, centered on
    ``x * stride`` — the ATSS/GFL/VFNet configs use AnchorGenerator's default
    center_offset=0 (anchor_generator.py:163-164), NOT the half-cell
    offset."""
    out = []
    for (h, w), s in zip(shapes, ATSS_STRIDES):
        cy = jnp.arange(h, dtype=jnp.float32)[:, None] * s
        cx = jnp.arange(w, dtype=jnp.float32)[None, :] * s
        half = scale * s / 2
        a = jnp.stack([
            jnp.broadcast_to(cx - half, (h, w)),
            jnp.broadcast_to(cy - half, (h, w)),
            jnp.broadcast_to(cx + half, (h, w)),
            jnp.broadcast_to(cy + half, (h, w)),
        ], axis=-1)
        out.append(a.reshape(-1, 4))
    return out


def atss_assign(level_anchors, gt_boxes, gt_valid, topk: int = 9):
    """ATSS assignment (mmdet/core/bbox/assigners/atss_assigner.py:60-154).
    Returns assigned_gt [A] (-1 = none), per-level concatenated.

    Exact semantics: EXACTLY min(topk, n_level) closest anchors per level
    per gt form the candidate set (top_k indices, not a tie-inclusive
    threshold); the IoU threshold is candidate mean + UNBIASED std
    (torch.std's default ddof=1); positives additionally need the anchor
    center strictly inside the gt by >0.01px on every side."""
    anchors = jnp.concatenate(level_anchors, axis=0)
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    dist = jnp.sqrt((acx[:, None] - gcx[None, :]) ** 2
                    + (acy[:, None] - gcy[None, :]) ** 2)  # [A, G]
    iou = box_ops.bbox_overlaps(anchors, gt_boxes)  # [A, G]
    num_g = gt_boxes.shape[0]

    # exactly-k closest anchors per level per gt -> candidate mask [A, G]
    cand = jnp.zeros(dist.shape, bool)
    start = 0
    k_total = 0
    for la in level_anchors:
        n = la.shape[0]
        k = min(topk, n)
        k_total += k
        _, idx = jax.lax.top_k(-dist[start:start + n].T, k)  # [G, k]
        cand = cand.at[start + idx, jnp.arange(num_g)[:, None]].set(True)
        start += n

    cand_f = cand.astype(jnp.float32)
    mean = jnp.sum(iou * cand_f, axis=0) / k_total
    var = jnp.sum(jnp.square(iou - mean[None, :]) * cand_f, axis=0) / max(
        k_total - 1, 1)
    thr = mean + jnp.sqrt(var)  # [G]

    inside = (jnp.minimum(
        jnp.minimum(acx[:, None] - gt_boxes[None, :, 0],
                    gt_boxes[None, :, 2] - acx[:, None]),
        jnp.minimum(acy[:, None] - gt_boxes[None, :, 1],
                    gt_boxes[None, :, 3] - acy[:, None])) > 0.01)
    pos = cand & (iou >= thr[None, :]) & inside & gt_valid[None, :]
    # each anchor takes its highest-IoU positive gt
    iou_pos = jnp.where(pos, iou, -1.0)
    best_gt = jnp.argmax(iou_pos, axis=1)
    assigned = jnp.where(jnp.any(pos, axis=1), best_gt, -1)
    return assigned


class ATSSLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_centerness: jnp.ndarray


def atss_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
              topk: int = 9) -> ATSSLossOut:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    level_anchors = atss_anchors(shapes)
    anchors = jnp.concatenate(level_anchors, axis=0)
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32)
         for c, _, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r, _ in level_outs])
    ctr_all = jnp.concatenate(
        [t.reshape(-1).astype(jnp.float32) for _, _, t in level_outs])

    assigned = atss_assign(level_anchors, gt_boxes, gt_valid, topk=topk)
    pos = assigned >= 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    safe_gt = jnp.clip(assigned, 0, gt_boxes.shape[0] - 1)

    onehot = jax.nn.one_hot(
        jnp.clip(gt_labels[safe_gt], 0, num_classes - 1), num_classes
    ) * pos[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, avg_factor=num_pos)

    matched = gt_boxes[safe_gt]
    tgt = box_ops.bbox2delta(anchors, matched, stds=(0.1, 0.1, 0.2, 0.2))
    loss_bbox = losses.smooth_l1_loss(
        reg_all, tgt, weight=pos[:, None].astype(jnp.float32),
        avg_factor=num_pos)

    # centerness target from the anchor center's position inside the gt
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    l = jnp.maximum(acx - matched[:, 0], 1e-6)
    r = jnp.maximum(matched[:, 2] - acx, 1e-6)
    t = jnp.maximum(acy - matched[:, 1], 1e-6)
    b = jnp.maximum(matched[:, 3] - acy, 1e-6)
    ctr_tgt = jnp.sqrt(
        (jnp.minimum(l, r) / jnp.maximum(l, r))
        * (jnp.minimum(t, b) / jnp.maximum(t, b)))
    loss_ctr = losses.binary_cross_entropy(
        ctr_all, ctr_tgt, weight=pos.astype(jnp.float32), avg_factor=num_pos)
    return ATSSLossOut(loss_cls, loss_bbox, loss_ctr)


def atss_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                score_thr=0.05, iou_threshold=0.6, max_per_img=100,
                scale_factor=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    level_anchors = atss_anchors(shapes)
    all_b, all_s, all_l = [], [], []
    for (cls, reg, ctr), anc in zip(level_outs, level_anchors):
        scores = jax.nn.sigmoid(cls.reshape(-1, num_classes).astype(jnp.float32)) \
            * jax.nn.sigmoid(ctr.reshape(-1, 1).astype(jnp.float32))
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        decoded = box_ops.delta2bbox(anc, deltas, stds=(0.1, 0.1, 0.2, 0.2),
                                     max_shape=img_shape)
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        all_b.append(decoded[top_i // num_classes])
        all_s.append(top_s)
        all_l.append((top_i % num_classes).astype(jnp.int32))
    boxes = jnp.concatenate(all_b)
    scores = jnp.concatenate(all_s)
    labels = jnp.concatenate(all_l)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    res = nms_ops.batched_nms(boxes, scores, labels, iou_threshold,
                              max_per_img, valid=scores > score_thr)
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds], res.valid)


class ATSS(nn.Module):
    """ResNet + FPN (P3-P7) + ATSSHead (mmdet/models/detectors/atss.py)."""

    num_classes: int = 80
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                               frozen_stages=1, dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_output",
                        relu_before_extra_convs=True, dtype=self.dtype,
                        name="neck")
        self.bbox_head = ATSSHead(num_classes=self.num_classes,
                                  dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
