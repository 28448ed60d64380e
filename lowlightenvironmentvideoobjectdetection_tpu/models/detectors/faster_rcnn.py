"""Faster R-CNN (two-stage) detector — single-image workload.

Parity targets: mmdetection/mmdet/models/detectors/two_stage.py +
faster_rcnn.py:6, in the DC5 single-level configuration used by the VID
stack (configs/_base_/models/faster_rcnn_r50_dc5.py). The multi-level FPN
variant reuses the same heads with per-level anchors.

This module is the skeleton every video model reuses: backbone -> neck ->
RPN -> RoIAlign -> Shared2FC head, plus functional train-loss and fixed-shape
single-image inference.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import nms as nms_ops
from ...ops.roi_align import roi_align
from ..backbones.resnet import ResNet
from ..dense_heads import rpn_head as rpn
from ..necks.channel_mapper import ChannelMapper
from ..roi_heads import bbox_head as bh
from ..vid.selsa import SelsaConfig, make_anchors


class FasterRCNN(nn.Module):
    """DC5 Faster R-CNN. cfg reuses SelsaConfig's shape/proposal fields."""

    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        c = self.cfg
        self.backbone = ResNet(
            depth=c.depth, strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
            out_indices=c.out_indices, frozen_stages=c.frozen_stages,
            dtype=c.compute_dtype, name="backbone",
        )
        self.neck = ChannelMapper(
            out_channels=c.neck_channels, kernel_size=3, num_levels=1,
            dtype=c.compute_dtype, name="neck",
        )
        self.rpn_head = rpn.RPNHead(
            feat_channels=c.neck_channels, num_base_anchors=c.num_base_anchors,
            dtype=c.compute_dtype, name="rpn_head",
        )
        self.bbox_head = bh.Shared2FCBBoxHead(
            num_classes=c.num_classes, with_selsa=False, dtype=jnp.float32,
            name="bbox_head",
        )

    def extract_feat(self, imgs):
        stage_feats = self.backbone(imgs)
        return stage_feats, self.neck(stage_feats[-1:])[0]

    def rpn_forward(self, neck_feat):
        return self.rpn_head([neck_feat])[0]

    def roi_feats(self, neck_feat, rois, batch_inds):
        return roi_align(
            neck_feat.astype(jnp.float32), rois,
            spatial_scale=1.0 / self.cfg.stride, batch_inds=batch_inds,
            out_size=7, sampling_ratio=2,
        )

    def bbox_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, imgs):
        _, neck_feat = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck_feat)
        rf = self.roi_feats(
            neck_feat, jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 8),
            jnp.zeros((8,), jnp.int32),
        )
        return cls, reg, self.bbox_forward(rf)


class DetTrainBatch(NamedTuple):
    img: jnp.ndarray  # [H, W, 3]
    img_shape: jnp.ndarray  # [2]
    gt_boxes: jnp.ndarray  # [G, 4]
    gt_labels: jnp.ndarray  # [G]
    gt_valid: jnp.ndarray  # [G]


def faster_rcnn_loss(model: FasterRCNN, params, batch: DetTrainBatch,
                     rng: jax.Array, anchors: jnp.ndarray):
    """Single-image two-stage training loss (two_stage.py forward_train)."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck_feat = model.apply(params, batch.img[None], method=FasterRCNN.extract_feat)
    cls, reg = model.apply(params, neck_feat, method=FasterRCNN.rpn_forward)

    rpn_losses = rpn.rpn_loss(
        [(cls[0], reg[0])], [anchors], batch.gt_boxes, batch.gt_valid,
        rng_rpn, batch.img_shape,
    )
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    tgts = bh.bbox_targets(
        props.boxes, props.valid, batch.gt_boxes, batch.gt_labels,
        batch.gt_valid, rng_roi, num_classes=cfg.num_classes,
        num_samples=cfg.num_roi_samples,
    )
    rf = model.apply(
        params, neck_feat[0], tgts.rois,
        jnp.zeros((tgts.rois.shape[0],), jnp.int32), method=FasterRCNN.roi_feats,
    )
    cls_score, bbox_pred = model.apply(params, rf, method=FasterRCNN.bbox_forward)
    roi_losses = bh.bbox_loss(cls_score, bbox_pred, tgts, num_classes=cfg.num_classes)
    total = (rpn_losses.loss_cls + rpn_losses.loss_bbox
             + roi_losses.loss_cls + roi_losses.loss_bbox)
    return total, {
        "loss": total,
        "loss_rpn_cls": rpn_losses.loss_cls,
        "loss_rpn_bbox": rpn_losses.loss_bbox,
        "loss_cls": roi_losses.loss_cls,
        "loss_bbox": roi_losses.loss_bbox,
        "acc": roi_losses.acc,
    }


def faster_rcnn_detect(
    model: FasterRCNN, params, img: jnp.ndarray, img_shape,
    anchors, scale_factor=None,
) -> nms_ops.DetResult:
    """Single-image inference -> fixed-shape detections (inference_detector)."""
    cfg = model.cfg
    _, neck_feat = model.apply(params, img[None], method=FasterRCNN.extract_feat)
    cls, reg = model.apply(params, neck_feat, method=FasterRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    rf = model.apply(
        params, neck_feat[0], props.boxes,
        jnp.zeros((props.boxes.shape[0],), jnp.int32), method=FasterRCNN.roi_feats,
    )
    cls_score, bbox_pred = model.apply(params, rf, method=FasterRCNN.bbox_forward)
    return bh.bbox_decode(
        props.boxes, cls_score, bbox_pred, img_shape,
        roi_valid=props.valid, scale_factor=scale_factor,
    )


def make_faster_rcnn(cfg: Optional[SelsaConfig] = None):
    cfg = cfg or SelsaConfig()
    return FasterRCNN(cfg=cfg), make_anchors(cfg)
