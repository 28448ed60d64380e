"""FoveaBox: anchor-free, per-level fovea-region assignment.

Parity target: mmdetection/mmdet/models/dense_heads/fovea_head.py:43-260 —
- per-level scale assignment: gts with sqrt(area) in ((8,32),(16,64),(32,128),
  (64,256),(128,512)) assign to levels 0-4 (strides 8..128);
- positive cells: the central fovea region (sigma=0.4 of the half-extent) of
  each assigned gt; overlaps resolve to the SMALLEST-area gt (the reference
  writes larger gts first so later/smaller overwrite, fovea_head.py:223-226);
- box targets: log((stride*x+?-x1)/base_len) style log-space ltrb normalized
  by the level's base_edge, clamped to [1/16, 16] (fovea_head.py:245-256);
- losses: sigmoid focal (avg = num_pos + num_imgs), SmoothL1(beta=0.11) on
  positives; decode: x1 = stride*x - base_len*exp(tx1) etc., clipped.

TPU-native: the per-gt python loop becomes a vectorized [P, G] candidate
mask + smallest-area argmin — identical winners, one fused kernel.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

FOVEA_STRIDES = (8, 16, 32, 64, 128)
BASE_EDGES = (16, 32, 64, 128, 256)
SCALE_RANGES = ((8, 32), (16, 64), (32, 128), (64, 256), (128, 512))


class FoveaHead(nn.Module):
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
                          name="conv_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="conv_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c), reg_out(r).astype(jnp.float32)))
        return tuple(outs)


class FoveaLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray


def _level_points(h: int, w: int, stride: int):
    """(x+0.5, y+0.5)*stride cell centers (fovea _get_points_single)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return gx.reshape(-1), gy.reshape(-1)


def fovea_targets_level(h, w, stride, base_len, scale_range, gt_boxes,
                        gt_labels, gt_valid, num_classes, sigma=0.4):
    """Per-level labels [P] and log-space ltrb targets [P, 4]."""
    px, py = _level_points(h, w, stride)  # image coords
    areas = jnp.sqrt(
        jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], 0)
        * jnp.maximum(gt_boxes[:, 3] - gt_boxes[:, 1], 0))
    in_scale = (areas >= scale_range[0]) & (areas <= scale_range[1]) & gt_valid

    # fovea region per gt, in feature-cell units, then back to image coords
    gx1, gy1, gx2, gy2 = (gt_boxes[:, i] / stride for i in range(4))
    half_w = 0.5 * (gx2 - gx1)
    half_h = 0.5 * (gy2 - gy1)
    left = jnp.clip(jnp.ceil(gx1 + (1 - sigma) * half_w - 0.5), 0, w - 1)
    right = jnp.clip(jnp.floor(gx1 + (1 + sigma) * half_w - 0.5), 0, w - 1)
    top = jnp.clip(jnp.ceil(gy1 + (1 - sigma) * half_h - 0.5), 0, h - 1)
    down = jnp.clip(jnp.floor(gy1 + (1 + sigma) * half_h - 0.5), 0, h - 1)

    cx = px / stride - 0.5  # back to integer cell index
    cy = py / stride - 0.5
    inside = (
        (cx[:, None] >= left[None]) & (cx[:, None] <= right[None])
        & (cy[:, None] >= top[None]) & (cy[:, None] <= down[None])
        & in_scale[None, :]
    )  # [P, G]
    # smallest area wins (reference writes larger first -> smaller overwrite)
    area_m = jnp.where(inside, areas[None, :], 1e18)
    best = jnp.argmin(area_m, axis=1)
    pos = jnp.any(inside, axis=1)
    labels = jnp.where(pos, gt_labels[best], num_classes)

    gb = gt_boxes[best]
    t = jnp.stack([
        (px - gb[:, 0]) / base_len,
        (py - gb[:, 1]) / base_len,
        (gb[:, 2] - px) / base_len,
        (gb[:, 3] - py) / base_len,
    ], axis=-1)
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    return labels, t, pos


def fovea_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
               sigma: float = 0.4) -> FoveaLossOut:
    labels_all, tgts_all, pos_all, cls_all, reg_all = [], [], [], [], []
    for i, (cls, reg) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        lab, tgt, pos = fovea_targets_level(
            h, w, FOVEA_STRIDES[i], BASE_EDGES[i], SCALE_RANGES[i],
            gt_boxes, gt_labels, gt_valid, num_classes, sigma)
        labels_all.append(lab)
        tgts_all.append(tgt)
        pos_all.append(pos)
        cls_all.append(cls.reshape(-1, num_classes).astype(jnp.float32))
        reg_all.append(reg.reshape(-1, 4))
    labels = jnp.concatenate(labels_all)
    tgts = jnp.concatenate(tgts_all)
    pos = jnp.concatenate(pos_all)
    cls = jnp.concatenate(cls_all)
    reg = jnp.concatenate(reg_all)
    num_pos = jnp.sum(pos)

    onehot = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls, onehot,
                                         avg_factor=num_pos + 1.0)
    loss_bbox = losses.smooth_l1_loss(
        reg, tgts, beta=0.11,
        weight=pos[:, None].astype(jnp.float32),
        avg_factor=jnp.maximum(num_pos, 1.0) * 4.0) * 4.0
    return FoveaLossOut(loss_cls, loss_bbox)


def fovea_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                 score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                 scale_factor=None) -> nms_ops.DetResult:
    all_b, all_s, all_l = [], [], []
    h_img, w_img = img_shape[0], img_shape[1]
    for i, (cls, reg) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        px, py = _level_points(h, w, FOVEA_STRIDES[i])
        t = jnp.exp(reg.reshape(-1, 4))
        bl = BASE_EDGES[i]
        boxes = jnp.stack([
            px - bl * t[:, 0], py - bl * t[:, 1],
            px + bl * t[:, 2], py + bl * t[:, 3],
        ], axis=-1)
        boxes = jnp.clip(
            boxes, 0.0, jnp.asarray([w_img, h_img, w_img, h_img], jnp.float32))
        scores = jax.nn.sigmoid(cls.reshape(-1, num_classes).astype(jnp.float32))
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        all_b.append(boxes[top_i // num_classes])
        all_s.append(top_s)
        all_l.append((top_i % num_classes).astype(jnp.int32))
    boxes = jnp.concatenate(all_b)
    scores = jnp.concatenate(all_s)
    labels = jnp.concatenate(all_l)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    res = nms_ops.batched_nms(boxes, scores, labels, iou_threshold,
                              max_per_img, valid=scores > score_thr)
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds],
                             res.valid)


class FoveaBox(nn.Module):
    """ResNet + FPN (P3-P7) + FoveaHead (mmdet/models/detectors/fovea.py)."""

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
        self.bbox_head = FoveaHead(num_classes=self.num_classes,
                                   dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
