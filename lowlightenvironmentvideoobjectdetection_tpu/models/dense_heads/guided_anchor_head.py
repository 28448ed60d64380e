"""Guided Anchoring (GA-Retina/GA-RPN) and Cascade RPN.

Parity targets:
- GuidedAnchorHead / GARetinaHead (mmdetection/mmdet/models/dense_heads/
  guided_anchor_head.py:1-860, ga_retina_head.py:1-109): a LOCATION branch
  (anchor-presence objectness; focal loss on center-region targets), a
  SHAPE branch (per-cell (dw, dh) in log space; bounded-IoU loss against
  the best-overlapping gt), a DeformConv FEATURE ADAPTATION driven by the
  shape prediction, then the usual cls/reg heads on adapted features with
  the PREDICTED ("guided") square-base anchors.
- CascadeRPNHead (cascade_rpn_head.py:1-784): two RPN stages; each runs an
  ADAPTIVE conv (DeformConv whose offsets are derived from the current
  per-cell anchor box, so the kernel samples inside the anchor), regresses
  anchor deltas, refines the anchors, and the final stage adds the
  objectness classifier. Static-shape assignment via max-IoU.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, losses, nms as nms_ops
from ...ops.deform_conv import deform_conv
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

GA_STRIDES = (8, 16, 32, 64, 128)


class AdaptiveDCN(nn.Module):
    """3x3 DeformConv with supplied offsets."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x, offset):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return jax.vmap(lambda xi, oi: deform_conv(xi, oi, w, b))(x, offset)


def shape_to_offsets(dwdh, stride):
    """Map predicted (dw, dh) anchor shapes to 3x3 DCN offsets so the taps
    cover the anchor extent (guided_anchor feature adaption: offsets from a
    1x1 conv on the shape pred — here the analytic version)."""
    w = jnp.exp(dwdh[..., 0]) * 8.0  # base scale 8, in stride units
    h = jnp.exp(dwdh[..., 1]) * 8.0
    chans = []
    for dy in (-1.0, 0.0, 1.0):
        for dx in (-1.0, 0.0, 1.0):
            chans.append(dy * (h / 3.0 - 1.0))
            chans.append(dx * (w / 3.0 - 1.0))
    return jnp.stack(chans, axis=-1)


class GARetinaHead(nn.Module):
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
        loc_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="conv_loc")
        shape_out = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape")
        adapt_cls = AdaptiveDCN(self.feat_channels, name="feature_adaption_cls")
        adapt_reg = AdaptiveDCN(self.feat_channels, name="feature_adaption_reg")
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="retina_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="retina_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            loc = loc_out(c).astype(jnp.float32)
            shape = shape_out(r).astype(jnp.float32)
            off = shape_to_offsets(jax.lax.stop_gradient(shape), 1)
            c_a = nn.relu(adapt_cls(c.astype(jnp.float32), off))
            r_a = nn.relu(adapt_reg(r.astype(jnp.float32), off))
            outs.append((cls_out(c_a.astype(self.dtype)),
                         reg_out(r_a.astype(self.dtype)), shape, loc))
        return tuple(outs)


def guided_anchors(shape_pred, stride, h, w):
    """Per-cell guided anchor from the predicted (dw, dh): centered square
    base (octave 8) scaled by exp(shape)."""
    cy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) * stride
    cx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) * stride
    aw = jnp.exp(shape_pred[..., 0]) * 8.0 * stride
    ah = jnp.exp(shape_pred[..., 1]) * 8.0 * stride
    a = jnp.stack([
        jnp.broadcast_to(cx, (h, w)) - aw / 2,
        jnp.broadcast_to(cy, (h, w)) - ah / 2,
        jnp.broadcast_to(cx, (h, w)) + aw / 2,
        jnp.broadcast_to(cy, (h, w)) + ah / 2,
    ], axis=-1)
    return a.reshape(-1, 4)


class GALossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_shape: jnp.ndarray
    loss_loc: jnp.ndarray


def ga_retina_loss(level_outs, gt_boxes, gt_labels, gt_valid, img_shape,
                   num_classes, center_ratio: float = 0.2) -> GALossOut:
    loss_loc = 0.0
    loss_shape = 0.0
    all_cls, all_reg, all_anchors = [], [], []
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    gw = jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], 1e-6)
    gh = jnp.maximum(gt_boxes[:, 3] - gt_boxes[:, 1], 1e-6)
    # each gt supervises the level matching its scale
    lvl_of_gt = jnp.clip(jnp.floor(jnp.log2(jnp.sqrt(gw * gh) / 64.0)) + 1,
                         0, len(level_outs) - 1).astype(jnp.int32)

    for li, (cls, reg, shape, loc) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        stride = GA_STRIDES[li]
        px = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) * stride
        py = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) * stride
        on_lvl = (lvl_of_gt == li) & gt_valid
        inside_ctr = (
            (px[None] >= (gcx - center_ratio * gw / 2)[:, None, None])
            & (px[None] <= (gcx + center_ratio * gw / 2)[:, None, None])
            & (py[None] >= (gcy - center_ratio * gh / 2)[:, None, None])
            & (py[None] <= (gcy + center_ratio * gh / 2)[:, None, None])
            & on_lvl[:, None, None]
        )  # [G, h, w]
        loc_tgt = jnp.any(inside_ctr, axis=0).astype(jnp.float32)
        loc_l = loc.reshape(h, w)
        p = jax.nn.sigmoid(loc_l)
        pt = jnp.where(loc_tgt > 0, p, 1 - p)
        alpha_t = jnp.where(loc_tgt > 0, 0.25, 0.75)
        fl = alpha_t * (1 - pt) ** 2 * (-jnp.log(jnp.clip(pt, 1e-8)))
        loss_loc = loss_loc + jnp.sum(fl) / jnp.maximum(jnp.sum(loc_tgt), 1.0)

        # shape loss: at positive cells, IoU of the guided anchor vs the gt
        best_gt = jnp.argmax(inside_ctr, axis=0)  # [h, w]
        pos_cell = jnp.any(inside_ctr, axis=0)
        anc = guided_anchors(shape.reshape(h, w, 2), stride, h, w)
        mg = gt_boxes[best_gt.reshape(-1)]
        iou = jnp.sum(
            jnp.stack([
                jnp.maximum(
                    jnp.minimum(anc[:, 2], mg[:, 2])
                    - jnp.maximum(anc[:, 0], mg[:, 0]), 0)
                * jnp.maximum(
                    jnp.minimum(anc[:, 3], mg[:, 3])
                    - jnp.maximum(anc[:, 1], mg[:, 1]), 0)
            ]), axis=0)[0]
        area = (jnp.maximum(anc[:, 2] - anc[:, 0], 0)
                * jnp.maximum(anc[:, 3] - anc[:, 1], 0)
                + jnp.maximum(mg[:, 2] - mg[:, 0], 0)
                * jnp.maximum(mg[:, 3] - mg[:, 1], 0) - iou)
        siou = iou / jnp.maximum(area, 1e-6)
        loss_shape = loss_shape + jnp.sum(
            -jnp.log(jnp.clip(siou, 1e-6)) * pos_cell.reshape(-1)
        ) / jnp.maximum(jnp.sum(pos_cell), 1.0)

        all_cls.append(cls.reshape(-1, num_classes).astype(jnp.float32))
        all_reg.append(reg.reshape(-1, 4).astype(jnp.float32))
        all_anchors.append(jax.lax.stop_gradient(anc))

    # standard retina cls/reg against the guided anchors
    from ...core import assigners

    cls_all = jnp.concatenate(all_cls)
    reg_all = jnp.concatenate(all_reg)
    anchors = jnp.concatenate(all_anchors)
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid, 0.5, 0.4, min_pos_iou=0.0)
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    onehot = jax.nn.one_hot(jnp.clip(assign.labels, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    wvec = (pos | neg).astype(jnp.float32)[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, weight=wvec,
                                         avg_factor=num_pos)
    matched = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                gt_boxes.shape[0] - 1)]
    tgt = box_ops.bbox2delta(anchors, matched)
    loss_bbox = losses.smooth_l1_loss(
        reg_all, tgt, beta=0.04, weight=pos[:, None].astype(jnp.float32),
        avg_factor=num_pos)
    L = len(level_outs)
    return GALossOut(loss_cls, loss_bbox, loss_shape / L, loss_loc / L)


def ga_retina_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                     score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                     loc_thr: float = 0.01, scale_factor=None
                     ) -> nms_ops.DetResult:
    all_b, all_s, all_l = [], [], []
    for li, (cls, reg, shape, loc) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        anc = guided_anchors(shape.reshape(h, w, 2), GA_STRIDES[li], h, w)
        keep = jax.nn.sigmoid(loc.reshape(-1)) >= loc_thr  # anchor presence
        scores = jax.nn.sigmoid(
            cls.reshape(-1, num_classes).astype(jnp.float32)
        ) * keep[:, None]
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        bi = top_i // num_classes
        decoded = box_ops.delta2bbox(anc[bi], deltas[bi], max_shape=img_shape)
        all_b.append(decoded)
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


class GARetinaNet(nn.Module):
    """ResNet + FPN + GARetinaHead (mmdet ga_retinanet configs)."""

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
        self.bbox_head = GARetinaHead(num_classes=self.num_classes,
                                      dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))


# ---------------------------------------------------------------------------
# Cascade RPN
# ---------------------------------------------------------------------------


def anchor_offsets(anchors, stride, h, w):
    """Adaptive-conv offsets: 3x3 taps spread over the anchor's extent
    (cascade_rpn_head.py AdaptiveConv offset computation)."""
    a = anchors.reshape(h, w, 4) / stride
    cx = (a[..., 0] + a[..., 2]) / 2 - (jnp.arange(w, dtype=jnp.float32)[None, :])
    cy = (a[..., 1] + a[..., 3]) / 2 - (jnp.arange(h, dtype=jnp.float32)[:, None])
    aw = jnp.maximum(a[..., 2] - a[..., 0], 1e-3)
    ah = jnp.maximum(a[..., 3] - a[..., 1], 1e-3)
    chans = []
    for dy in (-1.0, 0.0, 1.0):
        for dx in (-1.0, 0.0, 1.0):
            chans.append(cy + dy * (ah / 3.0) - dy)
            chans.append(cx + dx * (aw / 3.0) - dx)
    return jnp.stack(chans, axis=-1)


class CascadeRPNStage(nn.Module):
    feat_channels: int = 256
    with_cls: bool = True

    @nn.compact
    def __call__(self, feat, offsets):
        """feat: [1, h, w, C]; offsets: [h, w, 18]."""
        x = AdaptiveDCN(self.feat_channels, name="rpn_conv")(
            feat.astype(jnp.float32), offsets[None])
        x = nn.relu(x)
        reg = nn.Conv(4, (1, 1), name="rpn_reg")(x)
        cls = nn.Conv(1, (1, 1), name="rpn_cls")(x) if self.with_cls else None
        return cls, reg


class CascadeRPN(nn.Module):
    """Two-stage cascade RPN over a single DC5-style level.

    Stage 1 refines one square anchor per cell (no cls); stage 2 classifies
    + refines again (cascade_rpn_head.py with num_stages=2)."""

    feat_channels: int = 256
    stride: int = 16
    anchor_scale: float = 8.0

    def setup(self):
        self.stage1 = CascadeRPNStage(self.feat_channels, with_cls=False,
                                      name="stage1")
        self.stage2 = CascadeRPNStage(self.feat_channels, with_cls=True,
                                      name="stage2")

    def __call__(self, feat):
        """feat: [1, h, w, C] -> (cls [h*w], anchors1 [h*w, 4],
        anchors2 [h*w, 4])."""
        h, w = feat.shape[-3], feat.shape[-2]
        cy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) * self.stride
        cx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) * self.stride
        half = self.anchor_scale * self.stride / 2
        anchors = jnp.stack([
            jnp.broadcast_to(cx - half, (h, w)),
            jnp.broadcast_to(cy - half, (h, w)),
            jnp.broadcast_to(cx + half, (h, w)),
            jnp.broadcast_to(cy + half, (h, w)),
        ], axis=-1).reshape(-1, 4)

        off1 = anchor_offsets(anchors, self.stride, h, w)
        _, reg1 = self.stage1(feat, off1)
        anchors1 = box_ops.delta2bbox(anchors, reg1.reshape(-1, 4),
                                      stds=(0.1, 0.1, 0.5, 0.5))
        off2 = anchor_offsets(jax.lax.stop_gradient(anchors1), self.stride,
                              h, w)
        cls2, reg2 = self.stage2(feat, off2)
        anchors2 = box_ops.delta2bbox(anchors1, reg2.reshape(-1, 4),
                                      stds=(0.05, 0.05, 0.1, 0.1))
        return cls2.reshape(-1), anchors1, anchors2


class CascadeRPNLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_reg1: jnp.ndarray
    loss_reg2: jnp.ndarray


def cascade_rpn_loss(cls, anchors1, anchors2, gt_boxes, gt_valid
                     ) -> CascadeRPNLossOut:
    """Stage losses: IoU-based regression on both stages (vs best gt),
    BCE objectness on the final stage (pos: IoU>=.7 / neg: <.3)."""
    def stage_reg(anchors):
        iou = box_ops.bbox_overlaps(anchors, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best = jnp.max(iou, axis=1)
        pos = best >= 0.3
        return jnp.sum(-jnp.log(jnp.clip(best, 1e-6)) * pos) / jnp.maximum(
            jnp.sum(pos), 1.0), best

    loss1, _ = stage_reg(anchors1)
    loss2, best2 = stage_reg(anchors2)
    pos = best2 >= 0.7
    neg = best2 < 0.3
    tgt = pos.astype(jnp.float32)
    bce = jnp.maximum(cls, 0) - cls * tgt + jnp.log1p(jnp.exp(-jnp.abs(cls)))
    loss_cls = jnp.sum(bce * (pos | neg)) / jnp.maximum(
        jnp.sum(pos | neg), 1.0)
    return CascadeRPNLossOut(loss_cls, loss1, loss2)


class GARetinaNet(nn.Module):
    """Full guided-anchoring RetinaNet: ResNet + FPN + GARetinaHead
    (reference mmdetection/configs/guided_anchoring/ga_retinanet_r50_fpn —
    the registered head-only module becomes CLI-runnable through this
    assembly; round-3 family dispatch)."""

    num_classes: int = 80
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(
            depth=self.depth, out_indices=(1, 2, 3), frozen_stages=1,
            dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_input", dtype=self.dtype,
                        name="neck")
        self.head = GARetinaHead(num_classes=self.num_classes,
                                 dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.head(self.neck(self.backbone(imgs)))
