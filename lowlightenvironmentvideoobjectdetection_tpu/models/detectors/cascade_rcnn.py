"""Cascade R-CNN: three-stage box refinement.

Parity target: mmdetection/mmdet/models/detectors/cascade_rcnn.py +
mmdet/models/roi_heads/cascade_roi_head.py — 3 Shared2FC bbox heads with
class-agnostic regression, per-stage assigner IoU thresholds (0.5, 0.6, 0.7),
per-stage delta stds ((0.1,.1,.2,.2), (0.05,.05,.1,.1), (0.033,.033,.067,.067)),
stage loss weights (1, 0.5, 0.25); at test time each stage's regressed boxes
feed the next, and the final classification averages all stages' scores.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, nms as nms_ops
from ..dense_heads import rpn_head as rpn
from ..roi_heads import bbox_head as bh
from ..vid.selsa import SelsaConfig, make_anchors
from .faster_rcnn import DetTrainBatch, FasterRCNN

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = (
    (0.1, 0.1, 0.2, 0.2),
    (0.05, 0.05, 0.1, 0.1),
    (0.033, 0.033, 0.067, 0.067),
)
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


class CascadeRCNN(nn.Module):
    """Shares the Faster R-CNN backbone/neck/RPN, swaps in 3 bbox heads."""

    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        c = self.cfg
        base = FasterRCNN(cfg=c, name="base")
        # reuse base's submodules directly (its own bbox_head is unused)
        self.base = base
        self.cascade_heads = [
            bh.Shared2FCBBoxHead(
                num_classes=c.num_classes, with_selsa=False,
                reg_class_agnostic=True, dtype=jnp.float32,
                name=f"cascade_head{i}",
            )
            for i in range(3)
        ]

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def rpn_forward(self, neck_feat):
        return self.base.rpn_forward(neck_feat)

    def roi_feats(self, neck_feat, rois, batch_inds):
        return self.base.roi_feats(neck_feat, rois, batch_inds)

    def stage_forward(self, stage: int, roi_feats):
        return self.cascade_heads[stage](roi_feats)

    def __call__(self, imgs):
        _, neck_feat = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck_feat)
        rf = self.roi_feats(
            neck_feat, jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 8),
            jnp.zeros((8,), jnp.int32),
        )
        outs = [self.stage_forward(i, rf) for i in range(3)]
        return cls, reg, outs


def cascade_loss(model: CascadeRCNN, params, batch: DetTrainBatch,
                 rng: jax.Array, anchors: jnp.ndarray):
    cfg = model.cfg
    rngs = jax.random.split(rng, 4)
    _, neck_feat = model.apply(params, batch.img[None],
                               method=CascadeRCNN.extract_feat)
    cls, reg = model.apply(params, neck_feat, method=CascadeRCNN.rpn_forward)
    rpn_losses = rpn.rpn_loss(
        [(cls[0], reg[0])], [anchors], batch.gt_boxes, batch.gt_valid,
        rngs[0], batch.img_shape,
    )
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    total = rpn_losses.loss_cls + rpn_losses.loss_bbox
    metrics = {"loss_rpn_cls": rpn_losses.loss_cls,
               "loss_rpn_bbox": rpn_losses.loss_bbox}

    boxes, valid = props.boxes, props.valid
    for st in range(3):
        tgts = bh.bbox_targets(
            boxes, valid, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
            rngs[st + 1], num_classes=cfg.num_classes,
            num_samples=cfg.num_roi_samples,
            pos_iou_thr=STAGE_IOUS[st], neg_iou_thr=STAGE_IOUS[st],
            min_pos_iou=STAGE_IOUS[st], stds=STAGE_STDS[st],
            add_gt_as_proposals=(st == 0),
        )
        rf = model.apply(
            params, neck_feat[0], tgts.rois,
            jnp.zeros((tgts.rois.shape[0],), jnp.int32),
            method=CascadeRCNN.roi_feats,
        )
        cls_score, bbox_pred = model.apply(
            params, st, rf, method=CascadeRCNN.stage_forward,
        )
        sl = bh.bbox_loss(cls_score, bbox_pred, tgts,
                          num_classes=cfg.num_classes,
                          reg_class_agnostic=True)
        w = STAGE_WEIGHTS[st]
        total = total + w * (sl.loss_cls + sl.loss_bbox)
        metrics[f"s{st}.loss_cls"] = sl.loss_cls
        metrics[f"s{st}.loss_bbox"] = sl.loss_bbox
        # refine sampled rois for the next stage (class-agnostic deltas)
        refined = box_ops.delta2bbox(
            tgts.rois, bbox_pred.astype(jnp.float32), stds=STAGE_STDS[st],
            max_shape=batch.img_shape,
        )
        boxes = jax.lax.stop_gradient(refined)
        valid = tgts.label_weights > 0
    metrics["loss"] = total
    return total, metrics


def cascade_detect(model: CascadeRCNN, params, img: jnp.ndarray, img_shape,
                   anchors, scale_factor=None) -> nms_ops.DetResult:
    cfg = model.cfg
    _, neck_feat = model.apply(params, img[None],
                               method=CascadeRCNN.extract_feat)
    cls, reg = model.apply(params, neck_feat, method=CascadeRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    boxes = props.boxes
    scores_sum = 0.0
    for st in range(3):
        rf = model.apply(
            params, neck_feat[0], boxes,
            jnp.zeros((boxes.shape[0],), jnp.int32),
            method=CascadeRCNN.roi_feats,
        )
        cls_score, bbox_pred = model.apply(
            params, st, rf, method=CascadeRCNN.stage_forward,
        )
        scores_sum = scores_sum + jax.nn.softmax(
            cls_score.astype(jnp.float32), axis=-1)
        if st < 2:
            boxes = box_ops.delta2bbox(
                boxes, bbox_pred.astype(jnp.float32), stds=STAGE_STDS[st],
                max_shape=img_shape,
            )
    avg_scores = scores_sum / 3.0
    decoded = box_ops.delta2bbox(
        boxes, bbox_pred.astype(jnp.float32), stds=STAGE_STDS[2],
        max_shape=img_shape,
    )
    if scale_factor is not None:
        decoded = decoded / jnp.asarray(scale_factor)
    return nms_ops.multiclass_nms(
        decoded, avg_scores, score_thr=1e-4, iou_threshold=0.5, max_num=100,
        box_valid=props.valid,
    )


def make_cascade_rcnn(cfg: Optional[SelsaConfig] = None):
    cfg = cfg or SelsaConfig()
    return CascadeRCNN(cfg=cfg), make_anchors(cfg)
