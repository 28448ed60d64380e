"""GFL: Generalized Focal Loss detector (v1).

Parity target: mmdetection/mmdet/models/dense_heads/gfl_head.py — ATSS-style
architecture where the regression branch predicts a discrete DISTRIBUTION
over ``reg_max+1`` bins per box side (integral representation); losses are
Quality Focal Loss (classification target = IoU of the predicted box on
positives) and Distribution Focal Loss (CE onto the two bins adjacent to the
target distance), plus GIoU. Assignment = ATSS.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN
from .atss_head import ATSS_STRIDES, atss_anchors, atss_assign


class GFLHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
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
                          name="gfl_cls")
        reg_out = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="gfl_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c), reg_out(r)))
        return tuple(outs)


def _integral(reg_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """[..., 4*(reg_max+1)] distribution logits -> [..., 4] expected
    distances (in stride units)."""
    shape = reg_logits.shape[:-1]
    p = jax.nn.softmax(
        reg_logits.reshape(*shape, 4, reg_max + 1), axis=-1)
    bins = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def _dist_to_boxes(centers, dists, strides):
    """centers [N, 2] + ltrb dists (stride units) [N, 4] -> xyxy [N, 4]."""
    d = dists * strides[:, None]
    return jnp.stack([centers[:, 0] - d[:, 0], centers[:, 1] - d[:, 1],
                      centers[:, 0] + d[:, 2], centers[:, 1] + d[:, 3]],
                     axis=-1)


class GFLLossOut(NamedTuple):
    loss_qfl: jnp.ndarray
    loss_dfl: jnp.ndarray
    loss_giou: jnp.ndarray


def gfl_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
             reg_max: int = 16, beta: float = 2.0) -> GFLLossOut:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _ in level_outs]
    level_anchors = atss_anchors(shapes)
    anchors = jnp.concatenate(level_anchors, axis=0)
    strides = jnp.concatenate([
        jnp.full((h * w,), float(s))
        for (h, w), s in zip(shapes, ATSS_STRIDES)])
    centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                         (anchors[:, 1] + anchors[:, 3]) / 2], axis=-1)
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32)
         for c, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4 * (reg_max + 1)).astype(jnp.float32)
         for _, r in level_outs])

    assigned = atss_assign(level_anchors, gt_boxes, gt_valid)
    pos = assigned >= 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    safe_gt = jnp.clip(assigned, 0, gt_boxes.shape[0] - 1)
    matched = gt_boxes[safe_gt]

    # predicted boxes for the IoU quality target + GIoU loss (pairwise diag)
    dists = _integral(reg_all, reg_max)
    pred_boxes = _dist_to_boxes(centers, dists, strides)
    iou_q = jax.vmap(
        lambda a, b: box_ops.bbox_overlaps(a[None], b[None])[0, 0]
    )(pred_boxes, matched)
    iou_q = jax.lax.stop_gradient(jnp.clip(iou_q, 0.0, 1.0))

    # Quality Focal Loss: BCE to soft target y (IoU on pos class, 0 else),
    # modulated by |y - sigma|^beta
    sig = jax.nn.sigmoid(cls_all)
    y = jax.nn.one_hot(jnp.clip(gt_labels[safe_gt], 0, num_classes - 1),
                       num_classes) * (iou_q * pos)[:, None]
    bce = jnp.maximum(cls_all, 0) - cls_all * y + jnp.log1p(
        jnp.exp(-jnp.abs(cls_all)))
    qfl = jnp.abs(y - sig) ** beta * bce
    loss_qfl = jnp.sum(qfl) / num_pos

    # Distribution Focal Loss on positive ltrb distances (stride units)
    l = (centers[:, 0] - matched[:, 0]) / strides
    t = (centers[:, 1] - matched[:, 1]) / strides
    r = (matched[:, 2] - centers[:, 0]) / strides
    b = (matched[:, 3] - centers[:, 1]) / strides
    tgt = jnp.clip(jnp.stack([l, t, r, b], -1), 0.0, reg_max - 1e-4)  # [N, 4]
    tl = jnp.floor(tgt)
    wr = tgt - tl
    logp = jax.nn.log_softmax(
        reg_all.reshape(-1, 4, reg_max + 1), axis=-1)
    tli = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tli[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, (tli + 1)[..., None], axis=-1)[..., 0]
    dfl = -(lp_l * (1 - wr) + lp_r * wr)
    loss_dfl = jnp.sum(jnp.mean(dfl, axis=-1) * pos) / num_pos

    # GIoU on positives
    from ..detectors.detr import _giou

    giou_d = jax.vmap(lambda a, c: _giou(a[None], c[None])[0, 0])(
        pred_boxes, matched)
    loss_giou = jnp.sum((1.0 - giou_d) * pos * iou_q) / jnp.maximum(
        jnp.sum(iou_q * pos), 1e-6)
    return GFLLossOut(loss_qfl, 0.25 * loss_dfl, 2.0 * loss_giou)


def gfl_decode(level_outs, img_shape, num_classes, reg_max: int = 16,
               nms_pre=1000, score_thr=0.05, iou_threshold=0.6,
               max_per_img=100, scale_factor=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _ in level_outs]
    level_anchors = atss_anchors(shapes)
    all_b, all_s, all_l = [], [], []
    for (cls, reg), anc, ((h, w), s) in zip(level_outs, level_anchors,
                                            zip(shapes, ATSS_STRIDES)):
        scores = jax.nn.sigmoid(
            cls.reshape(-1, num_classes).astype(jnp.float32))
        dists = _integral(
            reg.reshape(-1, 4 * (reg_max + 1)).astype(jnp.float32), reg_max)
        centers = jnp.stack([(anc[:, 0] + anc[:, 2]) / 2,
                             (anc[:, 1] + anc[:, 3]) / 2], axis=-1)
        boxes = _dist_to_boxes(centers, dists,
                               jnp.full((anc.shape[0],), float(s)))
        ih, iw = img_shape[0], img_shape[1]
        boxes = jnp.clip(boxes, 0.0, jnp.asarray([iw, ih, iw, ih], jnp.float32))
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


class GFL(nn.Module):
    """ResNet + FPN + GFLHead (mmdet/models/detectors/gfl.py)."""

    num_classes: int = 80
    depth: int = 50
    reg_max: int = 16
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                               frozen_stages=1, dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_output",
                        relu_before_extra_convs=True, dtype=self.dtype,
                        name="neck")
        self.bbox_head = GFLHead(num_classes=self.num_classes,
                                 reg_max=self.reg_max, dtype=self.dtype,
                                 name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
