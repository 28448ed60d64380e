"""Cascade RPN.

Parity target: mmdetection/mmdet/models/dense_heads/cascade_rpn_head.py
(StageCascadeRPNHead ×2) + configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py —
a multi-stage RPN over ONE square anchor per position:

  stage 1: dilation-adapted 3×3 conv (adapt_cfg type='dilation', dilation=3),
           NO cls branch (with_cls=False), reg only; targets from the
           RegionAssigner (center_ratio=.2, ignore_ratio=.5, sampling=False);
           refined anchors = delta decode with target_stds (.1, .1, .5, .5);
  stage 2: offset-adapted DeformConv whose sampling grid follows each refined
           anchor's shape (AdaptiveConv type='offset',
           cascade_rpn_head.py:19-93), cls + reg; MaxIoU assignment
           (.7/.7/min_pos .3) with a 256 @ 0.5 RandomSampler; decode stds
           (.05, .05, .1, .1);
  losses : both stages use the LINEAR IoU loss (loss_weight 10) on DECODED
           boxes (reg_decoded_bbox=True); stage 1 averages over ALL anchors
           (sampling=False → num_total_samples = label.numel(),
           cascade_rpn_head.py:470-476), stage 2 over the sampled count;
           stage-2 objectness is BCE over the sampled positives+negatives.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import assigners, boxes as box_ops
from ...ops.deform_conv import deform_conv

S1_STDS = (0.1, 0.1, 0.5, 0.5)
S2_STDS = (0.05, 0.05, 0.1, 0.1)


class CascadeRPNHead(nn.Module):
    feat_channels: int = 256
    anchor_scale: float = 8.0  # single anchor: scale * stride square
    stride: int = 16

    def setup(self):
        self.stage1_conv = nn.Conv(
            self.feat_channels, (3, 3), padding=[(3, 3)] * 2,
            kernel_dilation=(3, 3), name="stage1_conv")
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
        """feat: [h, w, C] -> (reg [h*w, 4], adapted feat). with_cls=False
        per the crpn config's first stage."""
        x = nn.relu(self.stage1_conv(feat))
        return self.s1_reg(x).reshape(-1, 4), x

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
        """feat: [h, w, C]. Returns ((cls2, reg2), stage-1 reg, base anchors,
        refined anchors)."""
        h, w, _ = feat.shape
        anchors = self.base_anchors(h, w)
        r1, x1 = self.stage1(feat)
        refined = box_ops.delta2bbox(anchors, r1, stds=S1_STDS)
        c2, r2 = self.stage2(x1, refined)
        return (c2, r2), r1, anchors, refined


class CascadeRPNLoss(NamedTuple):
    loss_s1_reg: jnp.ndarray
    loss_s2_cls: jnp.ndarray
    loss_s2_reg: jnp.ndarray
    # kept for callers that sum all fields uniformly
    loss_s1_cls: jnp.ndarray


def _linear_iou(dec, gt):
    ix1 = jnp.maximum(dec[:, 0], gt[:, 0])
    iy1 = jnp.maximum(dec[:, 1], gt[:, 1])
    ix2 = jnp.minimum(dec[:, 2], gt[:, 2])
    iy2 = jnp.minimum(dec[:, 3], gt[:, 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    a1 = jnp.maximum(dec[:, 2] - dec[:, 0], 0) * jnp.maximum(
        dec[:, 3] - dec[:, 1], 0)
    a2 = jnp.maximum(gt[:, 2] - gt[:, 0], 0) * jnp.maximum(
        gt[:, 3] - gt[:, 1], 0)
    iou = inter / jnp.maximum(a1 + a2 - inter, 1e-6)
    return 1.0 - iou


def cascade_rpn_loss(model: CascadeRPNHead, params, feat, gt_boxes, gt_valid,
                     rng: jax.Array | None = None) -> CascadeRPNLoss:
    """Exact two-stage loss (see module docstring for the recipe)."""
    outs = model.apply(params, feat)
    (c2, r2), r1, anchors, refined = outs
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _crpn_losses_from_outputs(
        (c2, r2), r1, anchors, refined, gt_boxes, gt_valid, rng,
        stride=model.stride, anchor_scale=model.anchor_scale,
        featmap_hw=(feat.shape[0], feat.shape[1]))


# ---------------------------------------------------------------------------
# Full Cascade RPN proposer (crpn_r50 config analog): shared R50-DC5 +
# ChannelMapper trunk feeding the two-stage head on the single level.
# ---------------------------------------------------------------------------


class CascadeRPNModel(nn.Module):
    """Backbone+neck (the repo's shared DC5 trunk) + CascadeRPNHead —
    the CLI-runnable assembly for configs/det/cascade_rpn_* (reference:
    configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py, single-level here
    per the repo's DC5 convention)."""

    cfg: "object" = None  # SelsaConfig

    def setup(self):
        from ..detectors.faster_rcnn import FasterRCNN

        self.base = FasterRCNN(cfg=self.cfg, name="base")
        self.crpn = CascadeRPNHead(name="crpn")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def head(self, neck_feat):
        return self.crpn(neck_feat[0])

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        return self.head(neck)


def cascade_rpn_model_loss(model: CascadeRPNModel, params, batch, rng,
                           anchors=None):
    (c2, r2), r1, base_anchors, refined = model.apply(params, batch.img[None])
    ls = _crpn_losses_from_outputs((c2, r2), r1, base_anchors, refined,
                                   batch.gt_boxes, batch.gt_valid, rng,
                                   stride=16, anchor_scale=8.0,
                                   featmap_hw=_hw_from_count(
                                       base_anchors.shape[0], batch.img))
    total = ls.loss_s1_reg + ls.loss_s2_cls + ls.loss_s2_reg
    return total, {"loss": total, "loss_s1_reg": ls.loss_s1_reg,
                   "loss_s2_cls": ls.loss_s2_cls,
                   "loss_s2_reg": ls.loss_s2_reg}


def _hw_from_count(n, img):
    h = img.shape[0] // 16
    w = img.shape[1] // 16
    assert h * w == n, (h, w, n)
    return (h, w)


def _crpn_losses_from_outputs(stage2, r1, anchors, refined, gt_boxes,
                              gt_valid, rng, stride, anchor_scale,
                              featmap_hw) -> CascadeRPNLoss:
    c2, r2 = stage2
    G = gt_boxes.shape[0]
    A = anchors.shape[0]
    a1 = assigners.region_assign(gt_boxes, gt_valid, [featmap_hw], [stride],
                                 anchor_scale=anchor_scale)
    pos1 = (a1 > 0).astype(jnp.float32)
    tgt1 = gt_boxes[jnp.clip(a1 - 1, 0, G - 1)]
    dec1 = box_ops.delta2bbox(anchors, r1, stds=S1_STDS)
    loss_s1 = 10.0 * jnp.sum(_linear_iou(dec1, tgt1) * pos1) / A

    refined_sg = jax.lax.stop_gradient(refined)
    ar = assigners.max_iou_assign(
        refined_sg, gt_boxes, jnp.zeros((G,), jnp.int32), gt_valid,
        pos_iou_thr=0.7, neg_iou_thr=0.7, min_pos_iou=0.3)
    sm = assigners.random_sample_masks(ar, rng, num=256, pos_fraction=0.5)
    pos2 = sm.pos_mask.astype(jnp.float32)
    neg2 = sm.neg_mask.astype(jnp.float32)
    n_samp = jnp.maximum(jnp.sum(pos2) + jnp.sum(neg2), 1.0)
    tgt2 = gt_boxes[jnp.clip(ar.assigned_gt_inds - 1, 0, G - 1)]
    dec2 = box_ops.delta2bbox(refined_sg, r2, stds=S2_STDS)
    loss_s2_reg = 10.0 * jnp.sum(_linear_iou(dec2, tgt2) * pos2) / n_samp
    bce = jnp.maximum(c2, 0) - c2 * pos2 + jnp.log1p(jnp.exp(-jnp.abs(c2)))
    loss_s2_cls = jnp.sum(bce * (pos2 + neg2)) / n_samp
    return CascadeRPNLoss(loss_s1, loss_s2_cls, loss_s2_reg, jnp.zeros(()))


def cascade_rpn_propose(model: CascadeRPNModel, params, img, img_shape,
                        nms_pre: int = 2000, max_per_img: int = 300,
                        iou_threshold: float = 0.8, scale_factor=None):
    """Final proposals from stage 2 (crpn test_cfg: nms across the refined
    anchors decoded with the stage-2 stds)."""
    from ...core import nms as nms_ops

    (c2, r2), _, _, refined = model.apply(params, img[None])
    boxes = box_ops.delta2bbox(refined, r2, stds=S2_STDS)
    boxes = box_ops.clip_boxes(boxes, (img_shape[0], img_shape[1]))
    scores = jax.nn.sigmoid(c2)
    k = min(nms_pre, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    boxes = boxes[top_i]
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    res = nms_ops.batched_nms(boxes, top_s,
                              jnp.zeros((k,), jnp.int32), iou_threshold,
                              max_per_img)
    return nms_ops.DetResult(res.boxes, res.scores,
                             jnp.zeros((max_per_img,), jnp.int32), res.valid)
