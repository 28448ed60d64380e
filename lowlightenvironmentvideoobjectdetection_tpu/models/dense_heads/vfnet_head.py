"""VFNet: VarifocalNet with star-shaped deformable refinement.

Parity target: mmdetection/mmdet/models/dense_heads/vfnet_head.py:64-570 —
- FCOS-style point regression of an initial (l, t, r, b) box
  (exp + per-level scale * stride);
- STAR refinement: the initial box's 9 star points (corners, edge midpoints,
  center) drive a DeformConv over the reg and cls towers
  (star_dcn_offset, :275-314; gradient_mul=0.1 on the offset path);
- refined distances MULTIPLY the initial ones; classification is IoU-aware
  and trained with VARIFOCAL loss (alpha=.75, gamma=2, iou_weighted): the
  positive target is the refined box's IoU with its gt;
- GIoU losses on both the initial (w=1.5) and refined (w=2.0) boxes;
- ATSS assignment over one square anchor per cell (use_atss=True).

TPU-native: the deformable star sampling reuses ops.deform_conv (plain DCN,
bilinear gather + MXU contraction); assignment reuses atss_head.atss_assign.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import nms as nms_ops
from ...ops.deform_conv import deform_conv
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN
from .atss_head import atss_anchors, atss_assign

VFNET_STRIDES = (8, 16, 32, 64, 128)
REG_DENOMS = (64, 128, 256, 512, 1024)


class Scale(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * self.param("scale", nn.initializers.ones, ())


class StarDCN(nn.Module):
    """3x3 DeformConv whose offsets are supplied (not learned)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x, offset):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return jax.vmap(lambda xi, oi: deform_conv(xi, oi, w, b))(x, offset)


def star_offsets(dist, stride, gradient_mul: float = 0.1):
    """dist: [T, H, W, 4] (l, t, r, b) image-scale distances -> DCN offsets
    [T, H, W, 18] (y, x per tap, relative to the base 3x3 grid)."""
    d = ((1 - gradient_mul) * jax.lax.stop_gradient(dist)
         + gradient_mul * dist) / stride
    l, t, r, b = (d[..., i] for i in range(4))
    z = jnp.zeros_like(l)
    # 9 taps, (y, x) each: rows of the star (vfnet_head.py:300-311)
    taps = [(-t, -l), (-t, z), (-t, r),
            (z, -l), (z, z), (z, r),
            (b, -l), (b, z), (b, r)]
    base = [(-1., -1.), (-1., 0.), (-1., 1.),
            (0., -1.), (0., 0.), (0., 1.),
            (1., -1.), (1., 0.), (1., 1.)]
    chans = []
    for (ty, tx), (by, bx) in zip(taps, base):
        chans.append(ty - by)
        chans.append(tx - bx)
    return jnp.stack(chans, axis=-1)


class VFNetHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs = {b: [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f"{b}_conv{i}")
                     for i in range(self.stacked_convs)]
                 for b in ("cls", "reg")}
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="vfnet_reg")
        reg_refine_dcn = StarDCN(self.feat_channels, name="reg_refine_dconv")
        reg_refine = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name="vfnet_reg_refine")
        cls_dcn = StarDCN(self.feat_channels, name="cls_dconv")
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="vfnet_cls")
        outs = []
        for li, x in enumerate(feats):
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            stride = VFNET_STRIDES[li]
            init_dist = jnp.exp(
                Scale(name=f"scale{li}")(reg_out(r).astype(jnp.float32))
            ) * REG_DENOMS[li]
            offset = star_offsets(init_dist, stride)
            r_ref = nn.relu(reg_refine_dcn(r.astype(jnp.float32), offset))
            ref_mul = jnp.exp(Scale(name=f"scale_refine{li}")(
                reg_refine(r_ref.astype(self.dtype)).astype(jnp.float32)))
            refine_dist = ref_mul * init_dist
            c_al = nn.relu(cls_dcn(c.astype(jnp.float32), offset))
            cls = cls_out(c_al.astype(self.dtype))
            outs.append((cls, init_dist, refine_dist))
        return tuple(outs)


class VFNetLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_bbox_refine: jnp.ndarray


def _points(shapes):
    """VFNet points at ``x * stride`` (vfnet_head.py:612-616: use_atss adds
    ``stride * anchor_center_offset`` with center_offset=0.0)."""
    pts = []
    for (h, w), s in zip(shapes, VFNET_STRIDES):
        ys = jnp.arange(h, dtype=jnp.float32) * s
        xs = jnp.arange(w, dtype=jnp.float32) * s
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return pts


def _dist2box(p, d):
    return jnp.stack([p[:, 0] - d[:, 0], p[:, 1] - d[:, 1],
                      p[:, 0] + d[:, 2], p[:, 1] + d[:, 3]], axis=-1)


def _giou(a, b):
    x1 = jnp.maximum(a[:, 0], b[:, 0])
    y1 = jnp.maximum(a[:, 1], b[:, 1])
    x2 = jnp.minimum(a[:, 2], b[:, 2])
    y2 = jnp.minimum(a[:, 3], b[:, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    aa = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    ab = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    union = jnp.maximum(aa + ab - inter, 1e-6)
    iou = inter / union
    ex1 = jnp.minimum(a[:, 0], b[:, 0])
    ey1 = jnp.minimum(a[:, 1], b[:, 1])
    ex2 = jnp.maximum(a[:, 2], b[:, 2])
    ey2 = jnp.maximum(a[:, 3], b[:, 3])
    enc = jnp.maximum((ex2 - ex1) * (ey2 - ey1), 1e-6)
    return iou - (enc - union) / enc


def varifocal_loss(logits, targets, alpha=0.75, gamma=2.0, avg_factor=1.0):
    """VarifocalLoss (mmdet/models/losses/varifocal_loss.py): positives
    weighted by the IoU target q, negatives by alpha * p^gamma."""
    p = jax.nn.sigmoid(logits)
    pos = (targets > 0).astype(jnp.float32)
    weight = targets * pos + alpha * (p ** gamma) * (1 - pos)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.sum(bce * weight) / jnp.maximum(avg_factor, 1.0)


def vfnet_loss(level_outs, gt_boxes, gt_labels, gt_valid,
               num_classes) -> VFNetLossOut:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    pts = jnp.concatenate(_points(shapes), axis=0)
    level_anchors = atss_anchors(shapes)
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32)
         for c, _, _ in level_outs])
    init_all = jnp.concatenate([d.reshape(-1, 4) for _, d, _ in level_outs])
    ref_all = jnp.concatenate([d.reshape(-1, 4) for _, _, d in level_outs])

    assigned = atss_assign(level_anchors, gt_boxes, gt_valid)
    pos = assigned >= 0
    safe_gt = jnp.clip(assigned, 0, gt_boxes.shape[0] - 1)
    matched = gt_boxes[safe_gt]
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    init_box = _dist2box(pts, init_all)
    ref_box = _dist2box(pts, ref_all)
    giou_i = _giou(init_box, matched)
    giou_r = _giou(ref_box, matched)
    posf = pos.astype(jnp.float32)
    loss_bbox = 1.5 * jnp.sum((1 - giou_i) * posf) / num_pos
    loss_refine = 2.0 * jnp.sum((1 - giou_r) * posf) / num_pos

    # IoU-aware cls target: refined box's IoU for the matched class
    iou_q = jax.lax.stop_gradient(jnp.clip(giou_r, 0.0, 1.0)) * posf
    tgt = jax.nn.one_hot(jnp.clip(gt_labels[safe_gt], 0, num_classes - 1),
                         num_classes) * iou_q[:, None]
    loss_cls = varifocal_loss(cls_all, tgt, avg_factor=num_pos)
    return VFNetLossOut(loss_cls, loss_bbox, loss_refine)


def vfnet_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                 score_thr=0.05, iou_threshold=0.6, max_per_img=100,
                 scale_factor=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    pts = _points(shapes)
    all_b, all_s, all_l = [], [], []
    h_img, w_img = img_shape[0], img_shape[1]
    for (cls, _, ref), p in zip(level_outs, pts):
        boxes = _dist2box(p, ref.reshape(-1, 4))
        boxes = jnp.clip(boxes, 0.0,
                         jnp.asarray([w_img, h_img, w_img, h_img], jnp.float32))
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


class VFNet(nn.Module):
    """ResNet + FPN (P3-P7 on output) + VFNetHead
    (mmdet/models/detectors/vfnet.py)."""

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
        self.bbox_head = VFNetHead(num_classes=self.num_classes,
                                   dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
