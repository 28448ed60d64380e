"""FCOS: anchor-free single-stage detector.

Parity target: mmdetection/mmdet/models/dense_heads/fcos_head.py:15 —
per-pixel (class, centerness, l/t/r/b) predictions on FPN P3-P7, points
assigned to gts by containment within per-level regress ranges
((-1,64),(64,128),(128,256),(256,512),(512,inf)), smallest-area gt wins,
IoU loss on distances + BCE centerness + focal cls; decode multiplies
cls by centerness before NMS. Static shapes: all points scored, masked.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

FCOS_STRIDES = (8, 16, 32, 64, 128)
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))


class Scale(nn.Module):
    """Learnable per-level scalar on the regression branch."""

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, ())
        return x * s


class FCOSHead(nn.Module):
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
                          name="fcos_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="fcos_reg")
        ctr_out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="fcos_centerness")
        outs = []
        for li, x in enumerate(feats):
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            dist = jnp.exp(
                Scale(name=f"scale{li}")(reg_out(r).astype(jnp.float32))
            )
            outs.append((cls_out(c), dist, ctr_out(c)))
        return tuple(outs)


def fcos_points(shapes: Sequence[Tuple[int, int]]):
    """Per-level [H*W, 2] (x, y) center points in image coords."""
    pts = []
    for (h, w), s in zip(shapes, FCOS_STRIDES):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return pts


class FCOSLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_centerness: jnp.ndarray


def fcos_targets(points, ranges, gt_boxes, gt_labels, gt_valid):
    """Point-in-box assignment with per-level regress ranges
    (fcos_head.py get_targets semantics, no center sampling — the
    reference's FCOS R50 default).

    points: [P, 2]; ranges: [P, 2]. Returns (pos [P] bool,
    tgt_labels [P] int32, tgt_ltrb [P, 4]) — labels/ltrb meaningful
    only where pos.
    """
    # distances from every point to every gt: [P, G, 4] (l, t, r, b)
    l = points[:, None, 0] - gt_boxes[None, :, 0]
    t = points[:, None, 1] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - points[:, None, 0]
    b = gt_boxes[None, :, 3] - points[:, None, 1]
    ltrb = jnp.stack([l, t, r, b], axis=-1)
    inside = jnp.min(ltrb, axis=-1) > 0  # [P, G]
    maxd = jnp.max(ltrb, axis=-1)
    in_range = (maxd >= ranges[:, None, 0]) & (maxd <= ranges[:, None, 1])
    areas = jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], 0) * jnp.maximum(
        gt_boxes[:, 3] - gt_boxes[:, 1], 0)
    cand = inside & in_range & gt_valid[None, :]
    area_m = jnp.where(cand, areas[None, :], 1e18)
    best_gt = jnp.argmin(area_m, axis=1)  # [P]
    pos = jnp.any(cand, axis=1)

    tgt_ltrb = jnp.take_along_axis(ltrb, best_gt[:, None, None].repeat(4, -1),
                                   axis=1)[:, 0]  # [P, 4]
    tgt_labels = gt_labels[best_gt]
    return pos, tgt_labels, tgt_ltrb


def fcos_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes):
    """Point-in-box assignment with per-level regress ranges
    (fcos_head.py get_targets semantics)."""
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    pts = fcos_points(shapes)

    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32) for c, _, _ in level_outs])
    dist_all = jnp.concatenate([d.reshape(-1, 4) for _, d, _ in level_outs])
    ctr_all = jnp.concatenate(
        [t.reshape(-1).astype(jnp.float32) for _, _, t in level_outs])
    points = jnp.concatenate(pts, axis=0)  # [P, 2]
    ranges = jnp.concatenate([
        jnp.tile(jnp.asarray(REGRESS_RANGES[i], jnp.float32), (h * w, 1))
        for i, (h, w) in enumerate(shapes)
    ])  # [P, 2]

    pos, tgt_labels, tgt_ltrb = fcos_targets(
        points, ranges, gt_boxes, gt_labels, gt_valid)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    onehot = jax.nn.one_hot(jnp.clip(tgt_labels, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, avg_factor=num_pos)

    # IoU loss between predicted and target ltrb distances
    pl, pt_, pr, pb = [dist_all[:, i] for i in range(4)]
    tl, tt, tr, tb = [jnp.maximum(tgt_ltrb[:, i], 0.0) for i in range(4)]
    inter_w = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    inter_h = jnp.minimum(pt_, tt) + jnp.minimum(pb, tb)
    inter = jnp.maximum(inter_w, 0) * jnp.maximum(inter_h, 0)
    union = (pl + pr) * (pt_ + pb) + (tl + tr) * (tt + tb) - inter
    iou = inter / jnp.maximum(union, 1e-6)
    # centerness targets (fcos_head.py centerness_target)
    ctr_tgt = jnp.sqrt(
        (jnp.minimum(tl, tr) / jnp.maximum(jnp.maximum(tl, tr), 1e-6))
        * (jnp.minimum(tt, tb) / jnp.maximum(jnp.maximum(tt, tb), 1e-6))
    )
    posf = pos.astype(jnp.float32)
    loss_bbox = jnp.sum(-jnp.log(jnp.maximum(iou, 1e-6)) * posf * ctr_tgt) \
        / jnp.maximum(jnp.sum(ctr_tgt * posf), 1e-6)
    loss_ctr = losses.binary_cross_entropy(
        ctr_all, ctr_tgt, weight=posf, avg_factor=num_pos)
    return FCOSLossOut(loss_cls, loss_bbox, loss_ctr)


def fcos_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                scale_factor=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    pts = fcos_points(shapes)
    all_b, all_s, all_l = [], [], []
    for (cls, dist, ctr), p in zip(level_outs, pts):
        scores = jax.nn.sigmoid(cls.reshape(-1, num_classes).astype(jnp.float32)) \
            * jax.nn.sigmoid(ctr.reshape(-1, 1).astype(jnp.float32))
        d = dist.reshape(-1, 4)
        boxes = jnp.stack([
            p[:, 0] - d[:, 0], p[:, 1] - d[:, 1],
            p[:, 0] + d[:, 2], p[:, 1] + d[:, 3],
        ], axis=-1)
        h, w = img_shape[0], img_shape[1]
        boxes = jnp.clip(boxes, 0.0,
                         jnp.asarray([w, h, w, h], jnp.float32))
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
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds], res.valid)


class FCOS(nn.Module):
    """ResNet + FPN (P3-P7 on output) + FCOSHead
    (mmdet/models/detectors/fcos.py)."""

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
        self.bbox_head = FCOSHead(num_classes=self.num_classes,
                                  dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
