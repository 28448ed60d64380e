"""Sparse R-CNN: learnable proposals + iterative dynamic-interaction heads.

Parity target: mmdetection/mmdet/models/detectors/sparse_rcnn.py +
mmdet/models/dense_heads/embedding_rpn_head.py:1-100 (learnable proposal
boxes, init = whole image, + proposal features) and
mmdet/models/roi_heads/bbox_heads/dii_head.py (6 iterative stages: MHSA over
proposal features → dynamic instance interaction (per-proposal 1x1 conv
params generated from its feature, applied to its 7x7 RoI feature) → FFN →
cls + iterative delta refinement on the boxes; set-matched focal/L1/GIoU
losses per stage).

TPU-native: all 6 stages trace into one jit graph; the Hungarian match per
stage runs the native C++ JV solver via pure_callback (as DETR)."""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import boxes as box_ops, nms as nms_ops
from ...ops.roi_align import roi_align
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN
from .detr import _giou, _hungarian_host

FPN_STRIDES = (4, 8, 16, 32)


class DynamicConv(nn.Module):
    """Dynamic instance interaction (dii_head.py DynamicConv): the proposal
    feature generates two 1x1 conv kernels applied to its RoI feature."""

    feat_dim: int = 256
    dyn_dim: int = 64

    @nn.compact
    def __call__(self, prop_feat, roi_feat):
        """prop_feat: [N, D]; roi_feat: [N, 49, D] -> [N, D]."""
        n, s, d = roi_feat.shape
        params = nn.Dense(2 * d * self.dyn_dim, name="dynamic_layer")(prop_feat)
        p1 = params[:, : d * self.dyn_dim].reshape(n, d, self.dyn_dim)
        p2 = params[:, d * self.dyn_dim:].reshape(n, self.dyn_dim, d)
        x = jnp.einsum("nsd,nde->nse", roi_feat, p1)
        x = nn.relu(nn.LayerNorm(name="ln1")(x))
        x = jnp.einsum("nse,ned->nsd", x, p2)
        x = nn.relu(nn.LayerNorm(name="ln2")(x))
        x = x.reshape(n, s * d)
        x = nn.Dense(self.feat_dim, name="fc_out")(x)
        return nn.relu(nn.LayerNorm(name="ln3")(x))


class DIIStage(nn.Module):
    num_classes: int = 80
    feat_dim: int = 256
    heads: int = 8

    @nn.compact
    def __call__(self, prop_feat, roi_feat):
        """prop_feat: [N, D]; roi_feat: [N, 49, D].
        Returns (new_prop_feat, cls_logits [N, C], deltas [N, 4])."""
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="self_attn"
        )(prop_feat[None], prop_feat[None])[0]
        x = nn.LayerNorm(name="ln_attn")(prop_feat + attn)
        x = DynamicConv(feat_dim=self.feat_dim, name="dynamic")(x, roi_feat)
        ffn = nn.Dense(2048, name="ffn1")(x)
        ffn = nn.Dense(self.feat_dim, name="ffn2")(nn.relu(ffn))
        x = nn.LayerNorm(name="ln_ffn")(x + ffn)
        cls_x = x
        reg_x = x
        for i in range(1):
            cls_x = nn.relu(nn.Dense(self.feat_dim, name=f"cls_fc{i}")(cls_x))
            reg_x = nn.relu(nn.Dense(self.feat_dim, name=f"reg_fc{i}")(reg_x))
        cls = nn.Dense(self.num_classes,
                       bias_init=nn.initializers.constant(-4.595),
                       name="fc_cls")(cls_x)
        deltas = nn.Dense(4, name="fc_reg")(reg_x)
        return x, cls, deltas


class SparseRCNN(nn.Module):
    num_classes: int = 80
    num_proposals: int = 100
    num_stages: int = 6
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=1, dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=256, num_outs=4,
                        add_extra_convs="maxpool", dtype=self.dtype,
                        name="neck")
        # embedding RPN (embedding_rpn_head.py): learnable normalized boxes
        # (init: whole image) + proposal features
        self.init_boxes = self.param(
            "init_proposal_bboxes",
            lambda k, s: jnp.tile(jnp.asarray([[0.5, 0.5, 1.0, 1.0]]),
                                  (self.num_proposals, 1)),
            (self.num_proposals, 4))
        self.init_feats = self.param(
            "init_proposal_features", nn.initializers.normal(0.02),
            (self.num_proposals, 256))
        self.stages = [DIIStage(num_classes=self.num_classes,
                                name=f"stage{i}")
                       for i in range(self.num_stages)]

    def _roi_feats(self, fpn_feats, boxes):
        """Multi-level RoIAlign: per-roi FPN level by box scale
        (single_level_roi_extractor.py map_roi_levels), computed on all
        levels and selected by mask (static shapes)."""
        areas = jnp.sqrt(jnp.maximum(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6))
        lvl = jnp.clip(jnp.floor(jnp.log2(areas / 56.0 + 1e-6)), 0, 3
                       ).astype(jnp.int32)
        feats = []
        binds = jnp.zeros((boxes.shape[0],), jnp.int32)
        for i, f in enumerate(fpn_feats):
            rf = roi_align(f[0].astype(jnp.float32)[None], boxes,
                           spatial_scale=1.0 / FPN_STRIDES[i],
                           batch_inds=binds, out_size=7, sampling_ratio=2)
            feats.append(rf)
        stacked = jnp.stack(feats)  # [L, N, 7, 7, C]
        sel = jnp.take_along_axis(
            stacked, lvl[None, :, None, None, None], axis=0)[0]
        return sel.reshape(boxes.shape[0], 49, -1)

    def __call__(self, imgs, img_shape=None):
        """imgs: [1, H, W, 3]. Returns per-stage (cls [N, C], boxes [N, 4])."""
        h = img_shape[0] if img_shape is not None else imgs.shape[1]
        w = img_shape[1] if img_shape is not None else imgs.shape[2]
        scale = jnp.asarray([w, h, w, h], jnp.float32)
        fpn = self.neck(self.backbone(imgs))
        cxcywh = self.init_boxes * scale
        boxes = jnp.stack([
            cxcywh[:, 0] - cxcywh[:, 2] / 2, cxcywh[:, 1] - cxcywh[:, 3] / 2,
            cxcywh[:, 0] + cxcywh[:, 2] / 2, cxcywh[:, 1] + cxcywh[:, 3] / 2,
        ], axis=-1)
        prop = self.init_feats
        outs = []
        for stage in self.stages:
            roi = self._roi_feats(fpn, jax.lax.stop_gradient(boxes))
            prop, cls, deltas = stage(prop, roi)
            boxes = box_ops.delta2bbox(
                boxes, deltas, stds=(0.5, 0.5, 1.0, 1.0), max_shape=(h, w))
            outs.append((cls.astype(jnp.float32), boxes))
        return tuple(outs)


class SparseLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_giou: jnp.ndarray


def sparse_cost(cls, boxes, gt_boxes, gt_labels, gt_valid, img_shape,
                num_classes, cls_w=2.0, l1_w=5.0, giou_w=2.0,
                alpha=0.25, gamma=2.0, eps=1e-12):
    """[N, G] Hungarian cost with the sparse_rcnn config's semantics
    (mmdet/configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py:81-83):
    FocalLossCost(weight=2) = pos_cost - neg_cost on sigmoid probs
    (match_cost.py FocalLossCost.__call__), BBoxL1Cost(weight=5,
    box_format='xyxy') on image-size-normalized xyxy, IoUCost(giou,
    weight=2) on absolute xyxy. Invalid gt columns pinned at 1e6."""
    h, w = img_shape[0], img_shape[1]
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    p = jax.nn.sigmoid(cls)
    safe_lab = jnp.clip(gt_labels, 0, num_classes - 1)
    neg_cost = -jnp.log1p(-p + eps) * (1 - alpha) * p ** gamma
    pos_cost = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    cost_cls = (pos_cost - neg_cost)[:, safe_lab]  # [N, G]
    cost_l1 = jnp.sum(
        jnp.abs(boxes[:, None] / scale - gt_boxes[None] / scale), -1)
    cost_giou = -_giou(boxes, gt_boxes)  # [N, G]
    cost = cls_w * cost_cls + l1_w * cost_l1 + giou_w * cost_giou
    return jnp.where(gt_valid[None, :], cost, 1e6)


def sparse_rcnn_loss(stage_outs, gt_boxes, gt_labels, gt_valid, img_shape,
                     num_classes, cls_w=2.0, l1_w=5.0, giou_w=2.0
                     ) -> SparseLossOut:
    """Per-stage Hungarian set loss (sparse_rcnn config: focal cls cost +
    normalized-L1 + GIoU)."""
    h, w = img_shape[0], img_shape[1]
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    tl_cls = 0.0
    tl_l1 = 0.0
    tl_giou = 0.0
    num_pos = jnp.maximum(jnp.sum(gt_valid), 1.0)
    G = gt_boxes.shape[0]
    for cls, boxes in stage_outs:
        n = cls.shape[0]
        safe_lab = jnp.clip(gt_labels, 0, num_classes - 1)
        cost = sparse_cost(cls, boxes, gt_boxes, gt_labels, gt_valid,
                           img_shape, num_classes, cls_w, l1_w, giou_w)
        matched = jax.pure_callback(
            _hungarian_host,
            jax.ShapeDtypeStruct((G,), jnp.int32),
            jax.lax.stop_gradient(cost),
            vmap_method="sequential")
        is_m = gt_valid & (matched >= 0)
        safe_q = jnp.clip(matched, 0, n - 1)

        tgt = jnp.full((n,), num_classes, jnp.int32)
        q_idx = jnp.where(is_m, safe_q, n)
        tgt = tgt.at[q_idx].set(safe_lab, mode="drop")
        onehot = jax.nn.one_hot(jnp.clip(tgt, 0, num_classes - 1),
                                num_classes) * (tgt < num_classes)[:, None]
        pt = jnp.where(onehot > 0, jax.nn.sigmoid(cls), 1 - jax.nn.sigmoid(cls))
        alpha_t = jnp.where(onehot > 0, 0.25, 0.75)
        focal = alpha_t * (1 - pt) ** 2 * (-jnp.log(jnp.clip(pt, 1e-8)))
        tl_cls = tl_cls + cls_w * jnp.sum(focal) / num_pos

        mb = boxes[safe_q]
        tl_l1 = tl_l1 + l1_w * jnp.sum(
            jnp.abs(mb / scale - gt_boxes / scale) * is_m[:, None]) / num_pos
        gd = jnp.diagonal(_giou(mb, gt_boxes))
        tl_giou = tl_giou + giou_w * jnp.sum((1 - gd) * is_m) / num_pos
    k = len(stage_outs)
    return SparseLossOut(tl_cls / k, tl_l1 / k, tl_giou / k)


def sparse_rcnn_detect(stage_outs, num_classes, max_per_img: int = 100,
                       scale_factor=None) -> nms_ops.DetResult:
    """Decode from the LAST stage: per-proposal max class (no NMS, like
    DETR's top-k)."""
    cls, boxes = stage_outs[-1]
    probs = jax.nn.sigmoid(cls)
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    k = min(max_per_img, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    return nms_ops.DetResult(boxes[top_i], top_s, labels[top_i], top_s > 0.0)
