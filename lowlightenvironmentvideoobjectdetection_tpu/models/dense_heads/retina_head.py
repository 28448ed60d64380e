"""RetinaNet head + single-stage detector assembly.

Parity targets:
- RetinaHead: mmdetection/mmdet/models/dense_heads/retina_head.py:9 — 4
  stacked 3x3 convs per branch, A*C sigmoid cls + A*4 reg per level, octave
  anchors (octave_base_scale=4, scales_per_octave=3, strides 8..128).
- loss: anchor_head.py:426 with FocalLoss(gamma=2, alpha=.25) over all
  non-ignored anchors (no sampling), L1 reg on positives, averaged by the
  number of positives.
- get_bboxes: per-level top-k 1000, score_thr .05, class-wise NMS .5,
  max 100 — fixed-shape here.
- SingleStageDetector: mmdet/models/detectors/single_stage.py:52-98.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import AnchorGenerator, assigners, boxes as box_ops, losses
from ...core import nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN


class RetinaHead(nn.Module):
    num_classes: int = 80
    num_base_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs = {}
        for branch in ("cls", "reg"):
            convs[branch] = [
                nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"{branch}_conv{i}")
                for i in range(self.stacked_convs)
            ]
        cls_out = nn.Conv(
            self.num_base_anchors * self.num_classes, (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595),  # prior prob .01
            name="retina_cls",
        )
        reg_out = nn.Conv(self.num_base_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="retina_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c), reg_out(r)))
        return tuple(outs)


def retina_anchor_generator(strides=(8, 16, 32, 64, 128)) -> AnchorGenerator:
    return AnchorGenerator(
        strides=list(strides), ratios=[0.5, 1.0, 2.0],
        octave_base_scale=4, scales_per_octave=3,
    )


class RetinaLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray


def retina_loss(
    level_outs,
    level_anchors: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    img_shape,
    num_classes: int,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
) -> RetinaLossOut:
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes).astype(jnp.float32) for c, _ in level_outs]
    )
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r in level_outs]
    )
    anchors = jnp.concatenate(list(level_anchors), axis=0)
    h, w = img_shape[0], img_shape[1]
    inside = (
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 2] <= w) & (anchors[:, 3] <= h)
    )
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid,
        pos_iou_thr, neg_iou_thr, min_pos_iou=0.0, box_valid=inside,
    )
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    onehot = jax.nn.one_hot(
        jnp.clip(assign.labels, 0, num_classes - 1), num_classes
    ) * pos[:, None]
    weight = (pos | neg).astype(jnp.float32)[:, None]
    loss_cls = losses.sigmoid_focal_loss(
        cls_all, onehot, weight=weight, avg_factor=num_pos
    )

    matched = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[0] - 1)]
    tgt = box_ops.bbox2delta(anchors, matched)
    loss_bbox = losses.l1_loss(
        reg_all, tgt, weight=pos[:, None].astype(jnp.float32), avg_factor=num_pos
    )
    return RetinaLossOut(loss_cls, loss_bbox)


def retina_decode(
    level_outs,
    level_anchors: Sequence[jnp.ndarray],
    img_shape,
    num_classes: int,
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    iou_threshold: float = 0.5,
    max_per_img: int = 100,
    scale_factor=None,
) -> nms_ops.DetResult:
    """Fixed-shape single-stage decode (anchor_head get_bboxes semantics)."""
    all_boxes, all_scores, all_labels = [], [], []
    for (cls, reg), anc in zip(level_outs, level_anchors):
        scores = jax.nn.sigmoid(cls.reshape(-1, num_classes).astype(jnp.float32))
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        box_i = top_i // num_classes
        lab_i = (top_i % num_classes).astype(jnp.int32)
        decoded = box_ops.delta2bbox(anc[box_i], deltas[box_i], max_shape=img_shape)
        all_boxes.append(decoded)
        all_scores.append(top_s)
        all_labels.append(lab_i)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    res = nms_ops.batched_nms(
        boxes, scores, labels, iou_threshold, max_per_img,
        valid=scores > score_thr,
    )
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds], res.valid)


class RetinaSepBNHead(nn.Module):
    """RetinaSepBNHead (mmdet/models/dense_heads/retina_sepbn_head.py:9-103,
    the NAS-FPN detector head): conv KERNELS are shared across FPN levels
    (retina_sepbn_head.py:62-65 aliases every level's .conv to level 0's)
    while the normalization parameters are SEPARATE per level per stack.

    The per-level norm is realized as a trainable per-channel affine (BN
    with frozen unit statistics): single-clip training batches make live
    batch statistics degenerate, and at inference folded BN IS an affine —
    the head's defining structure (shared kernels + per-level norm params)
    is preserved exactly. Convs carry no bias (ConvModule with norm_cfg)."""

    num_classes: int = 80
    num_ins: int = 5
    num_base_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        assert len(feats) == self.num_ins
        convs = {}
        for branch in ("cls", "reg"):
            convs[branch] = [
                nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=f"{branch}_conv{i}")
                for i in range(self.stacked_convs)
            ]
        cls_out = nn.Conv(
            self.num_base_anchors * self.num_classes, (3, 3),
            padding=[(1, 1)] * 2, dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595),
            name="retina_cls",
        )
        reg_out = nn.Conv(self.num_base_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="retina_reg")

        def sep_bn(x, branch, lvl, stk):
            c = x.shape[-1]
            scale = self.param(f"{branch}_bn{lvl}_{stk}_scale",
                               nn.initializers.ones, (c,))
            bias = self.param(f"{branch}_bn{lvl}_{stk}_bias",
                              nn.initializers.zeros, (c,))
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

        outs = []
        for lvl, x in enumerate(feats):
            c = r = x.astype(self.dtype)
            for i in range(self.stacked_convs):
                c = nn.relu(sep_bn(convs["cls"][i](c), "cls", lvl, i))
                r = nn.relu(sep_bn(convs["reg"][i](r), "reg", lvl, i))
            outs.append((cls_out(c), reg_out(r)))
        return tuple(outs)


class NASFPNRetinaNet(nn.Module):
    """The NAS-FPN detector (mmdetection/configs/nas_fpn/
    retinanet_r50_nasfpn_crop640_50e_coco.py): ResNet + NASFPN(stack 7)
    neck + RetinaSepBNHead. Losses/decode are RetinaNet's."""

    num_classes: int = 80
    depth: int = 50
    stack_times: int = 7
    dtype: Any = jnp.bfloat16

    def setup(self):
        from ..necks.extra_necks import NASFPN

        self.backbone = ResNet(
            depth=self.depth, out_indices=(1, 2, 3), frozen_stages=1,
            dtype=self.dtype, name="backbone",
        )
        self.neck = NASFPN(out_channels=256, num_outs=5,
                           stack_times=self.stack_times, dtype=self.dtype,
                           name="neck")
        self.head = RetinaSepBNHead(num_classes=self.num_classes,
                                    dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.head(self.neck(self.backbone(imgs)))


class RetinaNet(nn.Module):
    """ResNet + FPN (extra convs on input) + RetinaHead."""

    num_classes: int = 80
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(
            depth=self.depth, out_indices=(1, 2, 3), frozen_stages=1,
            dtype=self.dtype, name="backbone",
        )
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_input", dtype=self.dtype, name="neck")
        self.head = RetinaHead(num_classes=self.num_classes,
                               dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        feats = self.neck(self.backbone(imgs))
        return self.head(feats)
