"""YOLOv3 detector (Darknet-53 + YOLO neck + YOLOv3 head).

Parity targets:
- Darknet: mmdetection/mmdet/models/backbones/darknet.py (conv32 stem, 5
  stages of stride-2 conv + (1,2,8,8,4) residual blocks, LeakyReLU 0.1,
  out_indices (3,4,5) -> 256/512/1024 channels).
- YOLOV3Neck: mmdet/models/necks/yolo_neck.py — per-scale DetectionBlock
  (5 convs alternating 1x1/3x3) with route-conv + upsample + concat.
- YOLOV3Head: mmdet/models/dense_heads/yolo_head.py:20 — bridge 3x3 conv +
  1x1 pred conv to A*(5+C); sigmoid xy offsets on the grid, exp wh on anchor
  priors; BCE objectness/class/xy + MSE wh losses with grid-cell assignment;
  fixed-shape decode + class-wise NMS (conf_thr .005, score_thr .05, nms .45).

BatchNorm here is train-mode-free (FrozenBatchNorm) consistent with the rest
of the framework's detection fine-tuning regime.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import boxes as box_ops, losses, nms as nms_ops
from ..backbones.resnet import FrozenBatchNorm

# (width, height) anchor priors per level, COCO defaults (yolo_head.py cfg)
YOLO_ANCHORS = (
    ((116, 90), (156, 198), (373, 326)),  # stride 32
    ((30, 61), (62, 45), (59, 119)),  # stride 16
    ((10, 13), (16, 30), (33, 23)),  # stride 8
)
YOLO_STRIDES = (32, 16, 8)


def _conv_unit(x, ch, k, stride, dtype, name):
    p = k // 2
    x = nn.Conv(ch, (k, k), strides=(stride, stride), padding=[(p, p)] * 2,
                use_bias=False, dtype=dtype, name=f"{name}_conv")(x)
    x = FrozenBatchNorm(dtype=dtype, name=f"{name}_bn")(x)
    return nn.leaky_relu(x, negative_slope=0.1)


class Darknet53(nn.Module):
    out_indices: Sequence[int] = (3, 4, 5)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = _conv_unit(x.astype(self.dtype), 32, 3, 1, self.dtype, "stem")
        outs = []
        blocks = (1, 2, 8, 8, 4)
        channels = (64, 128, 256, 512, 1024)
        for si, (nb, ch) in enumerate(zip(blocks, channels), start=1):
            x = _conv_unit(x, ch, 3, 2, self.dtype, f"stage{si}_down")
            for bi in range(nb):
                res = x
                x = _conv_unit(x, ch // 2, 1, 1, self.dtype, f"stage{si}_b{bi}_1")
                x = _conv_unit(x, ch, 3, 1, self.dtype, f"stage{si}_b{bi}_2")
                x = x + res
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)


class DetectionBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        x = _conv_unit(x, c, 1, 1, self.dtype, "c1")
        x = _conv_unit(x, c * 2, 3, 1, self.dtype, "c2")
        x = _conv_unit(x, c, 1, 1, self.dtype, "c3")
        x = _conv_unit(x, c * 2, 3, 1, self.dtype, "c4")
        return _conv_unit(x, c, 1, 1, self.dtype, "c5")


class YOLOV3Neck(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        """feats: (c256@s8, c512@s16, c1024@s32) -> 3 detection features,
        coarse to fine."""
        f8, f16, f32 = feats
        d1 = DetectionBlock(512, dtype=self.dtype, name="detect1")(f32)
        r1 = _conv_unit(d1, 256, 1, 1, self.dtype, "route1")
        r1 = jax.image.resize(r1, r1.shape[:-3] + (f16.shape[-3], f16.shape[-2], 256), "nearest")
        d2 = DetectionBlock(256, dtype=self.dtype, name="detect2")(
            jnp.concatenate([r1, f16.astype(self.dtype)], axis=-1)
        )
        r2 = _conv_unit(d2, 128, 1, 1, self.dtype, "route2")
        r2 = jax.image.resize(r2, r2.shape[:-3] + (f8.shape[-3], f8.shape[-2], 128), "nearest")
        d3 = DetectionBlock(128, dtype=self.dtype, name="detect3")(
            jnp.concatenate([r2, f8.astype(self.dtype)], axis=-1)
        )
        return d1, d2, d3


class YOLOV3Head(nn.Module):
    num_classes: int = 80
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        outs = []
        out_ch = 3 * (5 + self.num_classes)
        for i, (x, mid) in enumerate(zip(feats, (1024, 512, 256))):
            b = _conv_unit(x, mid, 3, 1, self.dtype, f"bridge{i}")
            outs.append(
                nn.Conv(out_ch, (1, 1), dtype=self.dtype, name=f"pred{i}")(b)
            )
        return tuple(outs)


class YOLOV3(nn.Module):
    num_classes: int = 80
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = Darknet53(dtype=self.dtype, name="backbone")
        self.neck = YOLOV3Neck(dtype=self.dtype, name="neck")
        self.bbox_head = YOLOV3Head(num_classes=self.num_classes,
                                    dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))


def _level_grid(pred, num_classes):
    """pred [H, W, 3*(5+C)] -> (xy_off, wh, conf, cls) each [H*W*3, ...]."""
    h, w, _ = pred.shape
    p = pred.reshape(h, w, 3, 5 + num_classes)
    return p, h, w


def yolo_decode_level(pred, anchors, stride, num_classes, img_shape):
    """One level -> (boxes [N,4], obj_scores [N], cls_scores [N,C])."""
    p, h, w = _level_grid(pred.astype(jnp.float32), num_classes)
    gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    cx = (jax.nn.sigmoid(p[..., 0]) + gx) * stride
    cy = (jax.nn.sigmoid(p[..., 1]) + gy) * stride
    aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
    ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
    bw = jnp.exp(jnp.clip(p[..., 2], -10, 8)) * aw
    bh = jnp.exp(jnp.clip(p[..., 3], -10, 8)) * ah
    boxes = jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    ).reshape(-1, 4)
    boxes = box_ops.clip_boxes(boxes, (img_shape[0], img_shape[1]))
    conf = jax.nn.sigmoid(p[..., 4]).reshape(-1)
    cls = jax.nn.sigmoid(p[..., 5:]).reshape(-1, num_classes)
    return boxes, conf, cls


def yolo_detect(level_preds, num_classes, img_shape, conf_thr=0.005,
                score_thr=0.05, iou_threshold=0.45, max_per_img=100,
                nms_pre=1000, scale_factor=None) -> nms_ops.DetResult:
    all_b, all_s, all_l = [], [], []
    for pred, anchors, stride in zip(level_preds, YOLO_ANCHORS, YOLO_STRIDES):
        boxes, conf, cls = yolo_decode_level(pred, anchors, stride,
                                             num_classes, img_shape)
        scores = cls * conf[:, None]
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        bi = top_i // num_classes
        li = (top_i % num_classes).astype(jnp.int32)
        ok = (conf[bi] > conf_thr) & (top_s > score_thr)
        all_b.append(boxes[bi])
        all_s.append(jnp.where(ok, top_s, 0.0))
        all_l.append(li)
    boxes = jnp.concatenate(all_b)
    scores = jnp.concatenate(all_s)
    labels = jnp.concatenate(all_l)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    res = nms_ops.batched_nms(boxes, scores, labels, iou_threshold,
                              max_per_img, valid=scores > score_thr)
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds], res.valid)


class YoloLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_conf: jnp.ndarray
    loss_xy: jnp.ndarray
    loss_wh: jnp.ndarray


def yolo_loss(level_preds, gt_boxes, gt_labels, gt_valid, num_classes,
              pos_iou_thr: float = 0.5, neg_iou_thr: float = 0.5,
              min_pos_iou: float = 0.0) -> YoloLossOut:
    """Exact GridAssigner semantics (mmdet/core/bbox/assigners/
    grid_assigner.py:42-156 + yolo_head.py:400-560), joint over levels:

    1. every anchor box whose max IoU over valid gts <= neg_iou_thr is a
       NEGATIVE; anchors above it start as ignored (-1);
    2. "responsible" anchors — those in the grid cell containing some gt's
       center at their level (anchor_generator.py:692-728) — with
       responsible-restricted max IoU > pos_iou_thr become positives of
       their argmax gt;
    3. each gt claims the responsible anchor(s) tying its best restricted
       IoU when it exceeds min_pos_iou, in ascending gt order (later gt
       overrides) — ONE winner per gt across all levels, not one per level;
    4. targets via YOLOBBoxCoder (yolo_bbox_coder.py:26-59): xy = cell
       offset + 0.5 clamped to [1e-6, 1-1e-6], wh = log(gt/anchor) clamped;
    5. losses are the config's UNNORMALIZED SUMS (reduction='sum') with
       loss weights cls 1 / conf 1 / xy 2 / wh 2; conf BCE runs over
       positives + negatives (ignored anchors excluded).
    """
    G = gt_boxes.shape[0]
    gx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    gw = gt_boxes[:, 2] - gt_boxes[:, 0]
    gh = gt_boxes[:, 3] - gt_boxes[:, 1]

    p_l, anc_l, resp_l, stride_l = [], [], [], []
    for pred, anchors, stride in zip(level_preds, YOLO_ANCHORS, YOLO_STRIDES):
        p, h, w = _level_grid(pred.astype(jnp.float32), num_classes)
        p_l.append(p.reshape(-1, 5 + num_classes))
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        acx = (jnp.arange(w, dtype=jnp.float32)[None, :, None] + 0.5) * stride
        acy = (jnp.arange(h, dtype=jnp.float32)[:, None, None] + 0.5) * stride
        anc = jnp.stack([
            jnp.broadcast_to(acx - aw / 2, (h, w, 3)),
            jnp.broadcast_to(acy - ah / 2, (h, w, 3)),
            jnp.broadcast_to(acx + aw / 2, (h, w, 3)),
            jnp.broadcast_to(acy + ah / 2, (h, w, 3)),
        ], axis=-1)
        anc_l.append(anc.reshape(-1, 4))
        # responsible: the anchor's cell holds some valid gt's center
        ci = jnp.floor(gx / stride).astype(jnp.int32)  # [G]
        cj = jnp.floor(gy / stride).astype(jnp.int32)
        cell_x = jnp.arange(w)[None, :, None]
        cell_y = jnp.arange(h)[:, None, None]
        r = jnp.any(
            (cell_x[..., None] == ci) & (cell_y[..., None] == cj)
            & gt_valid, axis=-1)  # [h, w, 1]
        resp_l.append(jnp.broadcast_to(r, (h, w, 3)).reshape(-1))
        stride_l.append(jnp.full((h * w * 3,), float(stride), jnp.float32))

    p = jnp.concatenate(p_l)           # [A, 5+C]
    anchors = jnp.concatenate(anc_l)   # [A, 4]
    resp = jnp.concatenate(resp_l)     # [A]
    stride_of = jnp.concatenate(stride_l)

    iou = box_ops.bbox_overlaps(gt_boxes, anchors)  # [G, A]
    ov_neg = jnp.where(gt_valid[:, None], iou, 0.0)
    max_all = jnp.max(ov_neg, axis=0) if G else jnp.zeros(anchors.shape[0])
    assigned = jnp.where(max_all <= neg_iou_thr, 0, -1)

    ov_pos = jnp.where(gt_valid[:, None] & resp[None, :], iou, -1.0)
    max_r = jnp.max(ov_pos, axis=0)
    arg_r = jnp.argmax(ov_pos, axis=0).astype(jnp.int32)
    step3 = (max_r > pos_iou_thr) & resp
    assigned = jnp.where(step3, arg_r + 1, assigned)

    gt_max = jnp.max(ov_pos, axis=1)  # [G]

    def body(g, acc):
        claim = (ov_pos[g] == gt_max[g]) & (gt_max[g] > min_pos_iou)
        return jnp.where(claim, g + 1, acc)

    assigned = jax.lax.fori_loop(0, G, body, assigned)

    pos = (assigned > 0).astype(jnp.float32)
    neg = (assigned == 0).astype(jnp.float32)
    best = jnp.clip(assigned - 1, 0, G - 1)

    # YOLOBBoxCoder targets against each positive's own anchor
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    eps = 1e-6
    tx = jnp.clip((gx[best] - acx) / stride_of + 0.5, eps, 1 - eps)
    ty = jnp.clip((gy[best] - acy) / stride_of + 0.5, eps, 1 - eps)
    tw = jnp.log(jnp.maximum(gw[best] / aw, eps))
    th = jnp.log(jnp.maximum(gh[best] / ah, eps))
    tgt_xy = jnp.stack([tx, ty], axis=-1)
    tgt_wh = jnp.stack([tw, th], axis=-1)
    tgt_cls = jax.nn.one_hot(
        jnp.clip(gt_labels[best], 0, num_classes - 1), num_classes)

    def bce(logit, tgt):
        return (jnp.maximum(logit, 0) - logit * tgt
                + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    loss_conf = jnp.sum(bce(p[:, 4], pos) * (pos + neg))
    loss_xy = 2.0 * jnp.sum(bce(p[:, 0:2], tgt_xy) * pos[:, None])
    loss_wh = 2.0 * jnp.sum(jnp.square(p[:, 2:4] - tgt_wh) * pos[:, None])
    loss_cls = jnp.sum(bce(p[:, 5:], tgt_cls) * pos[:, None])
    return YoloLossOut(loss_cls, loss_conf, loss_xy, loss_wh)
