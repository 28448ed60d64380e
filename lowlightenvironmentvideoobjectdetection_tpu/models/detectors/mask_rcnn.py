"""Mask R-CNN: Faster R-CNN + FCN mask head.

Parity target: mmdetection/mmdet/models/detectors/mask_rcnn.py +
mmdet/models/roi_heads/standard_roi_head.py mask branch — shares the box
branch with Faster R-CNN; a second 14x14 RoIAlign feeds the mask head; mask
BCE on positive rois' matched class channel; at test time masks are predicted
for the final detected boxes and pasted to image size.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import nms as nms_ops
from ...ops.roi_align import roi_align
from ..dense_heads import rpn_head as rpn
from ..roi_heads import bbox_head as bh
from ..roi_heads.mask_head import FCNMaskHead, mask_loss, mask_targets, paste_masks
from ..vid.selsa import SelsaConfig, make_anchors
from .faster_rcnn import FasterRCNN


class MaskRCNN(nn.Module):
    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.base = FasterRCNN(cfg=self.cfg, name="base")
        self.mask_head = FCNMaskHead(num_classes=self.cfg.num_classes,
                                     dtype=jnp.float32, name="mask_head")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def rpn_forward(self, neck_feat):
        return self.base.rpn_forward(neck_feat)

    def roi_feats(self, neck_feat, rois, batch_inds):
        return self.base.roi_feats(neck_feat, rois, batch_inds)

    def mask_roi_feats(self, neck_feat, rois, batch_inds):
        """14x14 RoIAlign for the mask branch."""
        return roi_align(
            neck_feat.astype(jnp.float32), rois,
            spatial_scale=1.0 / self.cfg.stride, batch_inds=batch_inds,
            out_size=14, sampling_ratio=2,
        )

    def bbox_forward(self, roi_feats):
        return self.base.bbox_forward(roi_feats)

    def mask_forward(self, mask_feats):
        return self.mask_head(mask_feats)

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        binds = jnp.zeros((4,), jnp.int32)
        box_out = self.bbox_forward(self.roi_feats(neck, rois, binds))
        mask_out = self.mask_forward(self.mask_roi_feats(neck, rois, binds))
        return cls, reg, box_out, mask_out


class MaskTrainBatch(NamedTuple):
    img: jnp.ndarray  # [H, W, 3]
    img_shape: jnp.ndarray  # [2]
    gt_boxes: jnp.ndarray  # [G, 4]
    gt_labels: jnp.ndarray  # [G]
    gt_valid: jnp.ndarray  # [G]
    gt_masks: jnp.ndarray  # [G, H, W] binary


def mask_rcnn_loss(model: MaskRCNN, params, batch: MaskTrainBatch,
                   rng: jax.Array, anchors: jnp.ndarray):
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.img[None], method=MaskRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=MaskRCNN.rpn_forward)
    rpn_losses = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                              batch.gt_valid, rng_rpn, batch.img_shape)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    tgts = bh.bbox_targets(props.boxes, props.valid, batch.gt_boxes,
                           batch.gt_labels, batch.gt_valid, rng_roi,
                           num_classes=cfg.num_classes,
                           num_samples=cfg.num_roi_samples)
    binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], tgts.rois, binds,
                     method=MaskRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf, method=MaskRCNN.bbox_forward)
    roi_losses = bh.bbox_loss(cls_score, bbox_pred, tgts,
                              num_classes=cfg.num_classes)

    # mask branch on the same sampled rois (positives weigh in the loss)
    mf = model.apply(params, neck[0], tgts.rois, binds,
                     method=MaskRCNN.mask_roi_feats)
    mask_logits = model.apply(params, mf, method=MaskRCNN.mask_forward)
    # matched gt index per sampled roi: recover from labels via assigner
    # (bbox_targets already matched them; recompute the index the same way)
    from ...core import assigners

    assign = assigners.max_iou_assign(
        tgts.rois, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
    )
    matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                       batch.gt_boxes.shape[0] - 1)
    m_tgt = mask_targets(batch.gt_masks.astype(jnp.float32), matched,
                         tgts.rois, mask_size=mask_logits.shape[1])
    loss_mask = mask_loss(mask_logits, m_tgt, tgts.labels, tgts.is_pos)

    total = (rpn_losses.loss_cls + rpn_losses.loss_bbox
             + roi_losses.loss_cls + roi_losses.loss_bbox + loss_mask)
    return total, {
        "loss": total, "loss_rpn_cls": rpn_losses.loss_cls,
        "loss_rpn_bbox": rpn_losses.loss_bbox, "loss_cls": roi_losses.loss_cls,
        "loss_bbox": roi_losses.loss_bbox, "loss_mask": loss_mask,
        "acc": roi_losses.acc,
    }


def mask_rcnn_detect(model: MaskRCNN, params, img: jnp.ndarray, img_shape,
                     anchors, scale_factor=None, img_hw=None):
    """Returns (DetResult, masks [max_out, H, W] bool)."""
    from .faster_rcnn import faster_rcnn_detect  # box branch shapes

    cfg = model.cfg
    _, neck = model.apply(params, img[None], method=MaskRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=MaskRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    binds = jnp.zeros((props.boxes.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], props.boxes, binds,
                     method=MaskRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf, method=MaskRCNN.bbox_forward)
    dets = bh.bbox_decode(props.boxes, cls_score, bbox_pred, img_shape,
                          roi_valid=props.valid, scale_factor=scale_factor)
    mb = jnp.zeros((dets.boxes.shape[0],), jnp.int32)
    mf = model.apply(params, neck[0], dets.boxes, mb,
                     method=MaskRCNN.mask_roi_feats)
    logits = model.apply(params, mf, method=MaskRCNN.mask_forward)
    cls_idx = jnp.clip(dets.labels, 0, cfg.num_classes - 1)
    probs = jax.nn.sigmoid(jnp.take_along_axis(
        logits, cls_idx[:, None, None, None], axis=-1)[..., 0])
    h, w = img_hw if img_hw is not None else (cfg.pad_h, cfg.pad_w)
    masks = paste_masks(probs, dets.boxes, h, w)
    return dets, masks


def make_mask_rcnn(cfg: Optional[SelsaConfig] = None):
    cfg = cfg or SelsaConfig(num_classes=80)
    return MaskRCNN(cfg=cfg), make_anchors(cfg)
