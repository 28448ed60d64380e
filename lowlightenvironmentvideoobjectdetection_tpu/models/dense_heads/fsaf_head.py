"""FSAF: anchor-free RetinaNet branch with online feature-level selection.

Parity target: mmdetection/mmdet/models/dense_heads/fsaf_head.py:15-422 and
configs/fsaf/fsaf_r50_fpn_1x_coco.py:
- RetinaNet tower with ONE anchor per cell (octave_base_scale=1, ratios [1]);
- relu on the reg branch (TBLR distances must be positive, fsaf_head.py:60);
- CenterRegionAssigner(pos_scale=0.2): a cell is a positive candidate for a
  gt when its center lies inside the 0.2-shrunk gt box; the smallest-area
  gt wins overlaps;
- TBLRBBoxCoder(normalizer=4): targets = (t,b,l,r) / (4 * stride);
- element-wise focal cls + IoU reg losses, then ONLINE LEVEL SELECTION
  (fsaf_head.py:340-422): per (gt, level) mean loss over that gt's
  candidates, each gt keeps only its argmin level; candidates of other
  levels are zeroed out of both losses.

TPU-native: the per-gt loops become [P, G] masks and segment means; the
level selection is a [L, G] argmin — all fused, no host sync.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

FSAF_STRIDES = (8, 16, 32, 64, 128)


class FSAFHead(nn.Module):
    """Retina tower, 1 anchor/cell, relu'd TBLR regression."""

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
                          name="retina_cls")
        # bias 0.25 prevents zero-area boxes at init (fsaf init_weights)
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          bias_init=nn.initializers.constant(0.25),
                          name="retina_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c),
                         nn.relu(reg_out(r).astype(jnp.float32))))
        return tuple(outs)


class FSAFLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray


def _centers(h, w, stride):
    """Anchor centers at ``x * stride``: the FSAF config's 1x-stride square
    anchors come from AnchorGenerator with default center_offset=0."""
    ys = jnp.arange(h, dtype=jnp.float32) * stride
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return gx.reshape(-1), gy.reshape(-1)


def _tblr_decode(px, py, pred, stride, normalizer=4.0):
    """TBLRBBoxCoder.decode: distances = pred * normalizer * stride."""
    d = pred * (normalizer * stride)
    return jnp.stack([px - d[:, 2], py - d[:, 0],
                      px + d[:, 3], py + d[:, 1]], axis=-1)


def fsaf_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
              pos_scale: float = 0.2, normalizer: float = 4.0) -> FSAFLossOut:
    G = gt_boxes.shape[0]
    L = len(level_outs)
    per_level_cls, per_level_reg = [], []
    per_level_gt_loss = []  # [L, G]
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    hw = (gt_boxes[:, 2] - gt_boxes[:, 0]) / 2
    hh = (gt_boxes[:, 3] - gt_boxes[:, 1]) / 2
    shrunk = jnp.stack([cx - pos_scale * hw, cy - pos_scale * hh,
                        cx + pos_scale * hw, cy + pos_scale * hh], axis=-1)
    areas = jnp.maximum(hw, 0) * jnp.maximum(hh, 0)

    total_cls = 0.0
    total_reg = 0.0
    num_pos_total = 0.0
    state = []
    for li, (cls, reg) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        stride = FSAF_STRIDES[li]
        px, py = _centers(h, w, stride)
        inside = (
            (px[:, None] >= shrunk[None, :, 0])
            & (px[:, None] <= shrunk[None, :, 2])
            & (py[:, None] >= shrunk[None, :, 1])
            & (py[:, None] <= shrunk[None, :, 3])
            & gt_valid[None, :]
        )  # [P, G]
        area_m = jnp.where(inside, areas[None, :], 1e18)
        best = jnp.argmin(area_m, axis=1)  # [P]
        pos = jnp.any(inside, axis=1)
        lab = jnp.where(pos, gt_labels[best], num_classes)

        clsf = cls.reshape(-1, num_classes).astype(jnp.float32)
        regf = reg.reshape(-1, 4)
        onehot = jax.nn.one_hot(jnp.clip(lab, 0, num_classes - 1),
                                num_classes) * pos[:, None]
        # element-wise focal (reduction='none' in the reference)
        p = jax.nn.sigmoid(clsf)
        pt = jnp.where(onehot > 0, p, 1 - p)
        alpha_t = jnp.where(onehot > 0, 0.25, 0.75)
        ce = -jnp.log(jnp.clip(pt, 1e-8))
        cls_elem = alpha_t * ((1 - pt) ** 2.0) * ce  # [P, C]

        # IoU loss between decoded TBLR boxes and the matched gt
        dec = _tblr_decode(px, py, regf, stride, normalizer)
        gb = gt_boxes[best]
        ix1 = jnp.maximum(dec[:, 0], gb[:, 0])
        iy1 = jnp.maximum(dec[:, 1], gb[:, 1])
        ix2 = jnp.minimum(dec[:, 2], gb[:, 2])
        iy2 = jnp.minimum(dec[:, 3], gb[:, 3])
        inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
        a1 = jnp.maximum(dec[:, 2] - dec[:, 0], 0) * jnp.maximum(
            dec[:, 3] - dec[:, 1], 0)
        a2 = jnp.maximum(gb[:, 2] - gb[:, 0], 0) * jnp.maximum(
            gb[:, 3] - gb[:, 1], 0)
        iou = inter / jnp.maximum(a1 + a2 - inter, 1e-6)
        reg_elem = -jnp.log(jnp.clip(iou, 1e-6))  # [P]

        # per-gt mean candidate loss on this level (collect_loss_level)
        elem = jnp.sum(cls_elem, axis=-1) + reg_elem  # [P]
        member = inside & (best[:, None] == jnp.arange(G)[None, :])
        cnt = jnp.sum(member, axis=0)
        gt_loss = jnp.where(
            cnt > 0,
            jnp.sum(elem[:, None] * member, axis=0) / jnp.maximum(cnt, 1),
            1e6,
        )  # [G]
        per_level_gt_loss.append(gt_loss)
        state.append((cls_elem, reg_elem, pos, best, lab))

    level_loss = jnp.stack(per_level_gt_loss)  # [L, G]
    min_level = jnp.argmin(level_loss, axis=0)  # [G]

    for li, (cls_elem, reg_elem, pos, best, lab) in enumerate(state):
        keep = pos & (min_level[best] == li)  # winning-level positives
        demoted = pos & ~keep
        # demoted candidates: zero that label's cls weight + reg weight
        cls_w = jnp.ones_like(cls_elem)
        onehot_dem = jax.nn.one_hot(
            jnp.clip(lab, 0, cls_elem.shape[-1] - 1), cls_elem.shape[-1]
        ) * demoted[:, None]
        cls_w = cls_w * (1.0 - onehot_dem)
        total_cls = total_cls + jnp.sum(cls_elem * cls_w)
        total_reg = total_reg + jnp.sum(reg_elem * keep)
        num_pos_total = num_pos_total + jnp.sum(keep)

    denom = jnp.maximum(num_pos_total, 1.0)
    return FSAFLossOut(total_cls / denom, total_reg / denom)


def fsaf_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                scale_factor=None, normalizer: float = 4.0) -> nms_ops.DetResult:
    all_b, all_s, all_l = [], [], []
    h_img, w_img = img_shape[0], img_shape[1]
    for li, (cls, reg) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        px, py = _centers(h, w, FSAF_STRIDES[li])
        boxes = _tblr_decode(px, py, reg.reshape(-1, 4), FSAF_STRIDES[li],
                             normalizer)
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


class FSAF(nn.Module):
    """ResNet + FPN + FSAFHead (mmdet/models/detectors/fsaf.py)."""

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
        self.bbox_head = FSAFHead(num_classes=self.num_classes,
                                  dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
