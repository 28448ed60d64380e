"""Cascade RPN.

Parity target: mmdetection/mmdet/models/dense_heads/cascade_rpn_head.py —
a multi-stage RPN where stage 1 regresses a single anchor per position
(dilation-adapted conv) and stage 2 re-regresses the REFINED anchors with an
offset-adapted (deformable) conv whose sampling grid follows each refined
anchor's shape. Static-shape two-stage version:

  stage 1: dilated 3x3 conv -> cls/reg over one anchor per position
  refine : delta decode -> refined anchors
  stage 2: DeformConv with offsets derived from the refined anchor vs the
           regular 3x3 grid (AdaptiveConv type='offset') -> cls/reg
  losses : per-stage max-IoU assignment against gt (the reference's region
           assigner for stage 1 is approximated by a center-radius max-IoU
           assignment — same supervision support, static shapes)
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import assigners, boxes as box_ops, losses as L
from ...ops.deform_conv import deform_conv


class CascadeRPNHead(nn.Module):
    feat_channels: int = 256
    anchor_scale: float = 8.0  # single anchor: scale * stride square
    stride: int = 16

    def setup(self):
        self.stage1_conv = nn.Conv(
            self.feat_channels, (3, 3), padding=[(3, 3)] * 2,
            kernel_dilation=(3, 3), name="stage1_conv")
        self.s1_cls = nn.Conv(1, (1, 1), name="s1_cls")
        self.s1_reg = nn.Conv(4, (1, 1), name="s1_reg")
        self.s2_weight = self.param(
            "s2_weight", nn.initializers.lecun_normal(),
            (3, 3, self.feat_channels, self.feat_channels))
        self.s2_bias = self.param("s2_bias", nn.initializers.zeros,
                                  (self.feat_channels,))
        self.s2_cls = nn.Conv(1, (1, 1), name="s2_cls")
        self.s2_reg = nn.Conv(4, (1, 1), name="s2_reg")

    def base_anchors(self, h, w):
        """[h*w, 4] single square anchor per position, centered on
        ``x * stride`` (crpn config: AnchorGenerator default
        center_offset=0)."""
        ys = jnp.arange(h) * self.stride
        xs = jnp.arange(w) * self.stride
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        half = self.anchor_scale * self.stride / 2.0
        return jnp.stack([cx - half, cy - half, cx + half, cy + half],
                         axis=-1).reshape(-1, 4)

    def stage1(self, feat):
        """feat: [h, w, C] -> (cls [h*w], reg [h*w, 4], adapted feat)."""
        x = nn.relu(self.stage1_conv(feat))
        return (self.s1_cls(x).reshape(-1),
                self.s1_reg(x).reshape(-1, 4), x)

    def stage2(self, feat, refined_anchors):
        """Offset-adapted conv: sampling grid follows each refined anchor
        (AdaptiveConv type='offset', cascade_rpn_head.py:54-93)."""
        h, w, c = feat.shape
        a = refined_anchors.reshape(h, w, 4)
        cx = (a[..., 0] + a[..., 2]) * 0.5 / self.stride
        cy = (a[..., 1] + a[..., 3]) * 0.5 / self.stride
        aw = (a[..., 2] - a[..., 0]) / self.stride
        ah = (a[..., 3] - a[..., 1]) / self.stride
        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]
        dys, dxs = [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                dys.append(cy + dy * ah / 3.0 - (yy + dy))
                dxs.append(cx + dx * aw / 3.0 - (xx + dx))
        # mmcv offset layout: [dy_0..dy_K, dx_0..dx_K] (deform_conv.py:54)
        offset = jnp.stack(dys + dxs, axis=-1)  # [h, w, 18]
        x = nn.relu(deform_conv(feat.astype(jnp.float32),
                                offset.astype(jnp.float32),
                                self.s2_weight.astype(jnp.float32),
                                self.s2_bias.astype(jnp.float32)))
        return self.s2_cls(x).reshape(-1), self.s2_reg(x).reshape(-1, 4)

    def __call__(self, feat):
        """feat: [h, w, C]. Returns per-stage (cls, reg) and refined
        anchors."""
        h, w, _ = feat.shape
        anchors = self.base_anchors(h, w)
        c1, r1, x1 = self.stage1(feat)
        refined = box_ops.delta2bbox(anchors, r1)
        c2, r2 = self.stage2(x1, refined)
        return (c1, r1), (c2, r2), anchors, refined


class CascadeRPNLoss(NamedTuple):
    loss_s1_cls: jnp.ndarray
    loss_s1_reg: jnp.ndarray
    loss_s2_cls: jnp.ndarray
    loss_s2_reg: jnp.ndarray


def _stage_loss(cls, reg, anchors, gt_boxes, gt_valid, pos_thr, neg_thr):
    gt_labels = jnp.zeros((gt_boxes.shape[0],), jnp.int32)
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid,
        pos_iou_thr=pos_thr, neg_iou_thr=neg_thr, min_pos_iou=pos_thr * 0.6,
    )
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    labels = pos.astype(jnp.float32)
    wt = (pos | neg).astype(jnp.float32)
    loss_cls = L.binary_cross_entropy(cls, labels, weight=wt,
                                      avg_factor=wt.sum())
    matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                       gt_boxes.shape[0] - 1)
    tgt = box_ops.bbox2delta(anchors, gt_boxes[matched])
    loss_reg = L.smooth_l1_loss(reg, tgt, beta=1.0 / 9.0,
                                weight=pos.astype(jnp.float32)[:, None],
                                avg_factor=jnp.maximum(pos.sum(), 1) * 4.0)
    return loss_cls, loss_reg


def cascade_rpn_loss(model: CascadeRPNHead, params, feat, gt_boxes, gt_valid):
    (c1, r1), (c2, r2), anchors, refined = model.apply(params, feat)
    l1c, l1r = _stage_loss(c1, r1, anchors, gt_boxes, gt_valid, 0.5, 0.3)
    l2c, l2r = _stage_loss(c2, r2, jax.lax.stop_gradient(refined), gt_boxes,
                           gt_valid, 0.7, 0.3)
    return CascadeRPNLoss(l1c, l1r, l2c, l2r)
