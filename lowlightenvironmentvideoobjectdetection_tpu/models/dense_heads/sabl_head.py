"""SABL: Side-Aware Boundary Localization (retina variant).

Parity target: mmdetection/mmdet/models/dense_heads/sabl_retina_head.py and
mmdet/core/bbox/coder/bucketing_bbox_coder.py (bbox2bucket :144-263,
bucket2bbox :266-350), configs/sabl/sabl_retinanet_r50_fpn_1x_coco.py —
- one square anchor per cell (scales [4]); classification tower as Retina;
- each box side localized by (a) a softmax over side_num = ceil(14/2) = 7
  buckets of the 3x-rescaled anchor and (b) a fine offset within the bucket;
- bucket-cls targets: one-hot nearest bucket, neighbor buckets (|offset|<1)
  IGNORED from the CE (cls_ignore_neighbor);
- offset targets on the top-2 nearest buckets (2nd only if |offset| < 1);
- decode picks the argmax bucket per side, applies its offset, and rescores
  with the bucket confidence (mean over sides, +2nd if adjacent).

TPU-native: all bucket targets are computed as dense [N, 4, side_num]
tensors with weight masks — no index_put loops.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

SABL_STRIDES = (8, 16, 32, 64, 128)
NUM_BUCKETS = 14
SIDE_NUM = 7  # ceil(14 / 2)
SCALE_FACTOR = 3.0


class SABLRetinaHead(nn.Module):
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
        bucket_cls = nn.Conv(SIDE_NUM * 4, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name="retina_bbox_cls")
        bucket_reg = nn.Conv(SIDE_NUM * 4, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name="retina_bbox_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c),
                         bucket_cls(r).astype(jnp.float32),
                         bucket_reg(r).astype(jnp.float32)))
        return tuple(outs)


def square_anchors(shapes, scale: float = 4.0, strides=SABL_STRIDES):
    """Square anchors centered on ``x * stride`` (the sabl_retinanet config
    uses AnchorGenerator's default center_offset=0)."""
    out = []
    for (h, w), s in zip(shapes, strides):
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


def _rescale(boxes, f=SCALE_FACTOR):
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    hw = (boxes[:, 2] - boxes[:, 0]) / 2 * f
    hh = (boxes[:, 3] - boxes[:, 1]) / 2 * f
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def _bucket_edges(props):
    """Returns (bucket_w [N], bucket_h [N], side buckets [N, 4, S]):
    the bucket CENTER coordinate per (side, bucket)."""
    p = _rescale(props)
    pw = p[:, 2] - p[:, 0]
    ph = p[:, 3] - p[:, 1]
    bw = pw / NUM_BUCKETS
    bh = ph / NUM_BUCKETS
    steps = 0.5 + jnp.arange(SIDE_NUM, dtype=jnp.float32)
    lb = p[:, 0, None] + steps[None] * bw[:, None]
    rb = p[:, 2, None] - steps[None] * bw[:, None]
    tb = p[:, 1, None] + steps[None] * bh[:, None]
    db = p[:, 3, None] - steps[None] * bh[:, None]
    return bw, bh, jnp.stack([lb, rb, tb, db], axis=1)  # [N, 4, S]


def bbox2bucket(props, gt):
    """Vectorized bbox2bucket: returns (offsets [N,4,S], offset_w [N,4,S],
    bucket_onehot [N,4,S], bucket_cls_w [N,4,S])."""
    bw, bh, buckets = _bucket_edges(props)
    g = jnp.stack([gt[:, 0], gt[:, 2], gt[:, 1], gt[:, 3]], axis=1)  # [N,4]
    denom = jnp.stack([bw, bw, bh, bh], axis=1)  # [N, 4]
    offsets = (buckets - g[:, :, None]) / jnp.maximum(denom[:, :, None], 1e-6)

    a = jnp.abs(offsets)
    nearest = jnp.argmin(a, axis=-1)  # [N, 4]
    onehot = jax.nn.one_hot(nearest, SIDE_NUM)  # [N, 4, S]
    # top-2 offset weights: nearest always, 2nd only if |offset| < 1
    a_masked = a + onehot * 1e9
    second = jnp.argmin(a_masked, axis=-1)
    second_w = (jnp.take_along_axis(a, second[..., None], -1)[..., 0]
                < 1.0).astype(jnp.float32)
    offset_w = onehot + jax.nn.one_hot(second, SIDE_NUM) * second_w[..., None]
    # bucket cls weights: ignore (zero) neighbors with |offset| < 1 that are
    # not the positive bucket (cls_ignore_neighbor)
    near = (a < 1.0).astype(jnp.float32)
    cls_w = 1.0 - jnp.clip(near - onehot, 0.0, 1.0)
    return offsets, offset_w, onehot, cls_w


def bucket2bbox(props, bucket_cls, bucket_off, max_shape=None):
    """Decode + bucketing-guided rescoring.

    bucket_cls/bucket_off: [N, 4, S]. Returns (boxes [N, 4], loc_conf [N]).
    """
    bw, bh, buckets = _bucket_edges(props)
    scores = jax.nn.softmax(bucket_cls, axis=-1)
    top2_s, top2_i = jax.lax.top_k(scores, 2)
    best = top2_i[..., 0]  # [N, 4]
    side = jnp.take_along_axis(buckets, best[..., None], -1)[..., 0]  # [N,4]
    off = jnp.take_along_axis(bucket_off, best[..., None], -1)[..., 0]
    denom = jnp.stack([bw, bw, bh, bh], axis=1)
    coord = side - off * denom  # [N, 4] = (x1, x2, y1, y2)
    boxes = jnp.stack([coord[:, 0], coord[:, 2], coord[:, 1], coord[:, 3]],
                      axis=-1)
    if max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        boxes = jnp.clip(boxes, 0.0, jnp.asarray([w, h, w, h], jnp.float32))
    conf = top2_s[..., 0] + top2_s[..., 1] * (
        jnp.abs(top2_i[..., 0] - top2_i[..., 1]) == 1)
    return boxes, jnp.mean(conf, axis=1)


class SABLLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox_cls: jnp.ndarray
    loss_bbox_reg: jnp.ndarray


def sabl_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
              pos_iou_thr: float = 0.5, neg_iou_thr: float = 0.4) -> SABLLossOut:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    anchors = jnp.concatenate(square_anchors(shapes), axis=0)
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32)
         for c, _, _ in level_outs])
    bcls_all = jnp.concatenate(
        [b.reshape(-1, 4, SIDE_NUM) for _, b, _ in level_outs])
    boff_all = jnp.concatenate(
        [o.reshape(-1, 4, SIDE_NUM) for _, _, o in level_outs])

    iou = box_ops.bbox_overlaps(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    pos = best_iou >= pos_iou_thr
    neg = (best_iou < neg_iou_thr) & (best_iou >= 0)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    onehot = jax.nn.one_hot(
        jnp.clip(gt_labels[best_gt], 0, num_classes - 1), num_classes
    ) * pos[:, None]
    wvec = (pos | neg).astype(jnp.float32)[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, weight=wvec,
                                         avg_factor=num_pos)

    matched = gt_boxes[best_gt]
    offs, offw, b_onehot, b_clsw = bbox2bucket(anchors, matched)
    posf = pos.astype(jnp.float32)[:, None, None]
    # bucket estimation CE (per side, softmax over buckets)
    logp = jax.nn.log_softmax(bcls_all, axis=-1)
    ce = -jnp.sum(logp * b_onehot, axis=-1, keepdims=True)  # [N, 4, 1]
    keep = jnp.sum(b_onehot * b_clsw, axis=-1, keepdims=True)
    loss_bcls = jnp.sum(ce * keep * posf) / (num_pos * 4.0)
    # fine offset smooth-l1 on weighted buckets (beta 1/9, weight 1.5 in cfg)
    diff = jnp.abs(boff_all - offs)
    beta = 1.0 / 9.0
    sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    loss_boff = 1.5 * jnp.sum(sl1 * offw * posf) / (num_pos * 4.0)
    return SABLLossOut(loss_cls, loss_bcls, loss_boff)


def sabl_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                scale_factor=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    level_anchors = square_anchors(shapes)
    all_b, all_s, all_l = [], [], []
    for (cls, bcls, boff), anc in zip(level_outs, level_anchors):
        scores = jax.nn.sigmoid(cls.reshape(-1, num_classes).astype(jnp.float32))
        boxes, conf = bucket2bbox(
            anc, bcls.reshape(-1, 4, SIDE_NUM), boff.reshape(-1, 4, SIDE_NUM),
            max_shape=img_shape)
        scores = scores * conf[:, None]  # bucketing-guided rescoring
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


class SABLRetinaNet(nn.Module):
    """ResNet + FPN + SABLRetinaHead."""

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
        self.bbox_head = SABLRetinaHead(num_classes=self.num_classes,
                                        dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
