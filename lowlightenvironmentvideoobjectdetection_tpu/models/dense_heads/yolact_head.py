"""YOLACT: real-time instance segmentation via prototype masks.

Parity target: mmdetection/mmdet/models/dense_heads/yolact_head.py:1-943 —
- YOLACTHead: RetinaNet-style anchor head (3 anchors/cell, shared stem)
  predicting class scores, box deltas, and k=32 per-anchor mask
  COEFFICIENTS (tanh);
- YOLACTProtonet: 3 convs + upsample + convs on P3 producing k PROTOTYPE
  masks at 1/4 resolution; instance mask = sigmoid(protos @ coeffs),
  cropped to the (gt at train / detected at test) box;
- YOLACTSegmHead: per-class semantic-segmentation aux loss on P3;
- losses: CE cls with 3:1 OHEM negatives, SmoothL1 box, per-pixel BCE mask
  (normalized by gt box area), BCE semantic aux.

TPU-native: mask assembly is one [HW, k] x [k, N] MXU matmul; crops are
static-shape multiplicative box masks instead of dynamic slicing.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

# yolact_r50 config: grid strides are the NON-INTEGER 550/featmap values
# (yolact config strides=[550/x for x in (69, 35, 18, 9, 5)]) while the
# anchor base sizes stay the power-of-two base_sizes=[8..128]
YOLACT_STRIDES = tuple(550.0 / x for x in (69, 35, 18, 9, 5))
YOLACT_BASE_SIZES = (8, 16, 32, 64, 128)
NUM_PROTOS = 32


class YOLACTHead(nn.Module):
    num_classes: int = 80
    num_base_anchors: int = 3
    feat_channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        stem = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="head_conv")
        cls_out = nn.Conv(self.num_base_anchors * (self.num_classes + 1),
                          (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="conv_cls")
        reg_out = nn.Conv(self.num_base_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="conv_reg")
        coeff_out = nn.Conv(self.num_base_anchors * NUM_PROTOS, (3, 3),
                            padding=[(1, 1)] * 2, dtype=self.dtype,
                            name="conv_coeff")
        outs = []
        for x in feats:
            h = nn.relu(stem(x.astype(self.dtype)))
            outs.append((cls_out(h), reg_out(h),
                         jnp.tanh(coeff_out(h).astype(jnp.float32))))
        return tuple(outs)


class Protonet(nn.Module):
    """P3 -> k prototype masks (yolact_head.py YOLACTProtonet)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, p3: jnp.ndarray) -> jnp.ndarray:
        x = p3.astype(self.dtype)
        for i in range(3):
            x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype, name=f"conv{i}")(x))
        x = jax.image.resize(x, x.shape[:-3] + (x.shape[-3] * 2,
                                                x.shape[-2] * 2, 256),
                             "bilinear")
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="conv3")(x))
        return nn.relu(
            nn.Conv(NUM_PROTOS, (1, 1), dtype=self.dtype, name="conv_proto")(x)
        ).astype(jnp.float32)


class SegmHead(nn.Module):
    """Per-class semantic aux head on P3 (YOLACTSegmHead)."""

    num_classes: int = 80
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, p3):
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="segm_conv")(p3.astype(self.dtype)).astype(
            jnp.float32)


class YOLACT(nn.Module):
    num_classes: int = 80
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                               frozen_stages=1, dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_input", dtype=self.dtype,
                        name="neck")
        self.bbox_head = YOLACTHead(num_classes=self.num_classes,
                                    dtype=self.dtype, name="bbox_head")
        self.protonet = Protonet(dtype=self.dtype, name="protonet")
        self.segm_head = SegmHead(num_classes=self.num_classes,
                                  dtype=self.dtype, name="segm_head")

    def __call__(self, imgs):
        fpn = self.neck(self.backbone(imgs))
        return (self.bbox_head(fpn), self.protonet(fpn[0]),
                self.segm_head(fpn[0]))


def yolact_anchors(shapes, strides=YOLACT_STRIDES,
                   base_sizes=YOLACT_BASE_SIZES):
    """3 anchors/cell in the reference's ratio ORDER (0.5, 1, 2) — the
    per-anchor prediction channels follow generator order — sized
    octave_base_scale(3) * base_size (decoupled from the fractional grid
    stride), centered at (x + 0.5) * stride (explicit centers= in the
    config)."""
    out = []
    for (h, w), s, bs in zip(shapes, strides, base_sizes):
        cy = (jnp.arange(h, dtype=jnp.float32)[:, None, None] + 0.5) * s
        cx = (jnp.arange(w, dtype=jnp.float32)[None, :, None] + 0.5) * s
        anchors = []
        for r in (0.5, 1.0, 2.0):
            base = 3.0 * bs
            aw = base * jnp.sqrt(1.0 / r)
            ah = base * jnp.sqrt(r)
            anchors.append((aw, ah))
        aw = jnp.asarray([a[0] for a in anchors])
        ah = jnp.asarray([a[1] for a in anchors])
        a = jnp.stack([
            jnp.broadcast_to(cx - aw / 2, (h, w, 3)),
            jnp.broadcast_to(cy - ah / 2, (h, w, 3)),
            jnp.broadcast_to(cx + aw / 2, (h, w, 3)),
            jnp.broadcast_to(cy + ah / 2, (h, w, 3)),
        ], axis=-1)
        out.append(a.reshape(-1, 4))
    return out


def _crop_mask(mask: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Zero the mask outside the box — static-shape multiplicative crop.
    mask: [h, w]; box in mask coordinates."""
    h, w = mask.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = ((xs >= box[0]) & (xs <= box[2])
              & (ys >= box[1]) & (ys <= box[3]))
    return mask * inside


class YOLACTLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_mask: jnp.ndarray
    loss_segm: jnp.ndarray


def yolact_loss(level_outs, protos, segm, gt_boxes, gt_labels, gt_valid,
                gt_masks, img_shape, num_classes,
                neg_pos_ratio: int = 3, strides=YOLACT_STRIDES,
                base_sizes=YOLACT_BASE_SIZES) -> YOLACTLossOut:
    """CE cls w/ OHEM negatives + SmoothL1 box + prototype-mask BCE +
    semantic aux BCE (yolact_head.py loss/loss_single + protonet loss)."""
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    level_anchors = yolact_anchors(shapes, strides, base_sizes)
    anchors = jnp.concatenate(level_anchors, axis=0)
    C1 = num_classes + 1
    cls_all = jnp.concatenate(
        [c.reshape(-1, C1).astype(jnp.float32) for c, _, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r, _ in level_outs])
    coef_all = jnp.concatenate(
        [k.reshape(-1, NUM_PROTOS) for _, _, k in level_outs])

    iou = box_ops.bbox_overlaps(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    pos = best_iou >= 0.5
    neg = best_iou < 0.4
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    # OHEM: hardest negatives at 3:1 (ssd_head-style, as yolact uses CE)
    tgt = jnp.where(pos, gt_labels[best_gt] + 1, 0)  # 0 = background
    logp = jax.nn.log_softmax(cls_all)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
    neg_ce = jnp.where(neg & ~pos, ce, -1.0)
    rank = jnp.argsort(jnp.argsort(-neg_ce))
    hard_neg = (rank < neg_pos_ratio * num_pos) & neg & ~pos
    loss_cls = jnp.sum(ce * (pos | hard_neg)) / num_pos

    matched = gt_boxes[best_gt]
    tdelta = box_ops.bbox2delta(anchors, matched, stds=(0.1, 0.1, 0.2, 0.2))
    loss_bbox = losses.smooth_l1_loss(
        reg_all, tdelta, weight=pos[:, None].astype(jnp.float32),
        avg_factor=num_pos)

    # prototype mask loss on (up to) the highest-IoU positive per gt
    ph, pw = protos.shape[-3], protos.shape[-2]
    proto_flat = protos.reshape(-1, ph * pw, NUM_PROTOS)[0]  # [hw, k]
    h, w = img_shape[0], img_shape[1]
    sx, sy = pw / w, ph / h
    iou_pos = jnp.where(pos[:, None], iou, -1.0)  # [A, G]
    best_anchor = jnp.argmax(iou_pos, axis=0)  # [G]
    has_pos = jnp.max(iou_pos, axis=0) > 0
    coeffs = coef_all[best_anchor]  # [G, k]
    mlogits = (proto_flat @ coeffs.T).T.reshape(-1, ph, pw)  # [G, ph, pw]
    gt_small = jax.image.resize(
        gt_masks.astype(jnp.float32), (gt_masks.shape[0], ph, pw), "nearest")
    box_small = gt_boxes * jnp.asarray([sx, sy, sx, sy])
    bce = jnp.maximum(mlogits, 0) - mlogits * gt_small + jnp.log1p(
        jnp.exp(-jnp.abs(mlogits)))
    cropped = jax.vmap(_crop_mask)(bce, box_small)
    areas = jnp.maximum(
        (box_small[:, 2] - box_small[:, 0])
        * (box_small[:, 3] - box_small[:, 1]), 1.0)
    wgt = (gt_valid & has_pos).astype(jnp.float32)
    loss_mask = jnp.sum(
        jnp.sum(cropped, axis=(1, 2)) / areas * wgt) / jnp.maximum(
        jnp.sum(wgt), 1.0)

    # semantic aux: per-class max of gt masks at segm resolution
    sh, sw = segm.shape[-3], segm.shape[-2]
    seg_small = jax.image.resize(
        gt_masks.astype(jnp.float32), (gt_masks.shape[0], sh, sw), "nearest")
    onehot_g = jax.nn.one_hot(jnp.clip(gt_labels, 0, num_classes - 1),
                              num_classes) * gt_valid[:, None]
    seg_tgt = jnp.max(
        seg_small[:, :, :, None] * onehot_g[:, None, None, :], axis=0)
    slog = segm.reshape(sh, sw, num_classes)
    loss_segm = jnp.mean(
        jnp.maximum(slog, 0) - slog * seg_tgt
        + jnp.log1p(jnp.exp(-jnp.abs(slog))))
    return YOLACTLossOut(loss_cls, loss_bbox, loss_mask, loss_segm)


def yolact_detect(level_outs, protos, img_shape, num_classes, nms_pre=1000,
                  score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                  scale_factor=None, strides=YOLACT_STRIDES,
                  base_sizes=YOLACT_BASE_SIZES):
    """Decode boxes (softmax cls, NMS) and assemble cropped instance masks.
    Returns (DetResult, masks [max_per_img, ph, pw])."""
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    level_anchors = yolact_anchors(shapes, strides, base_sizes)
    C1 = num_classes + 1
    all_b, all_s, all_l, all_k = [], [], [], []
    for (cls, reg, coef), anc in zip(level_outs, level_anchors):
        probs = jax.nn.softmax(
            cls.reshape(-1, C1).astype(jnp.float32), axis=-1)[:, 1:]
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        coefs = coef.reshape(-1, NUM_PROTOS)
        flat = probs.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        bi = top_i // num_classes
        decoded = box_ops.delta2bbox(anc[bi], deltas[bi],
                                     stds=(0.1, 0.1, 0.2, 0.2),
                                     max_shape=img_shape)
        all_b.append(decoded)
        all_s.append(top_s)
        all_l.append((top_i % num_classes).astype(jnp.int32))
        all_k.append(coefs[bi])
    boxes = jnp.concatenate(all_b)
    scores = jnp.concatenate(all_s)
    labels = jnp.concatenate(all_l)
    coeffs = jnp.concatenate(all_k)
    res = nms_ops.batched_nms(boxes, scores, labels, iou_threshold,
                              max_per_img, valid=scores > score_thr)
    sel_coeffs = coeffs[res.inds]
    ph, pw = protos.shape[-3], protos.shape[-2]
    proto_flat = protos.reshape(-1, ph * pw, NUM_PROTOS)[0]
    masks = jax.nn.sigmoid(
        (proto_flat @ sel_coeffs.T).T.reshape(-1, ph, pw))
    h, w = img_shape[0], img_shape[1]
    box_small = res.boxes * jnp.asarray([pw / w, ph / h, pw / w, ph / h])
    masks = jax.vmap(_crop_mask)(masks, box_small)
    out_boxes = res.boxes
    if scale_factor is not None:
        out_boxes = out_boxes / jnp.asarray(scale_factor)
    det = nms_ops.DetResult(out_boxes, res.scores, labels[res.inds],
                            res.valid)
    return det, masks
