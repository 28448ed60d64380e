"""Hybrid Task Cascade (HTC) and SCNet.

Parity targets:
- mmdetection/mmdet/models/detectors/htc.py + roi_heads/htc_roi_head.py —
  3-stage cascade box refinement interleaved with per-stage mask heads
  whose features flow stage-to-stage (mask information flow), plus a
  semantic segmentation branch on the neck features fused into both roi
  branches.
- mmdetection/mmdet/models/detectors/scnet.py + roi_heads/scnet_roi_head.py
  — the HTC refinement with a feature-relay global-context branch: a
  GAP->fc image-level context vector added to every roi's features
  (``with_global_context=True`` here).

Built on the Cascade R-CNN machinery (cascade_rcnn.py STAGE_* schedules);
single-level DC5 features as everywhere in this framework.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import boxes as box_ops, nms as nms_ops
from ...ops.roi_align import roi_align
from ..dense_heads import rpn_head as rpn
from ..roi_heads import bbox_head as bh
from ..roi_heads.mask_head import FCNMaskHead, mask_loss, mask_targets
from ..vid.selsa import SelsaConfig, make_anchors
from .cascade_rcnn import STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS
from .faster_rcnn import FasterRCNN
from .mask_rcnn import MaskTrainBatch


class SemanticHead(nn.Module):
    """FCN semantic branch on the neck map (htc_semantic_head): conv stack ->
    per-pixel class logits; its penultimate features fuse into roi feats."""

    num_classes: int = 80

    @nn.compact
    def __call__(self, neck_feat):
        x = neck_feat
        for i in range(2):
            x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                                name=f"conv{i}")(x))
        feat = x
        logits = nn.Conv(self.num_classes + 1, (1, 1), name="seg")(x)
        return logits, feat


class HTC(nn.Module):
    cfg: SelsaConfig = SelsaConfig()
    with_semantic: bool = True
    with_global_context: bool = False  # True = SCNet flavor

    def setup(self):
        c = self.cfg
        self.base = FasterRCNN(cfg=c, name="base")
        self.cascade_heads = [
            bh.Shared2FCBBoxHead(
                num_classes=c.num_classes, with_selsa=False,
                reg_class_agnostic=True, dtype=jnp.float32,
                name=f"cascade_head{i}")
            for i in range(3)
        ]
        self.mask_heads = [
            FCNMaskHead(num_classes=c.num_classes, dtype=jnp.float32,
                        name=f"mask_head{i}")
            for i in range(3)
        ]
        self.mask_info_convs = [
            nn.Conv(c.neck_channels, (3, 3), padding=[(1, 1)] * 2,
                    name=f"mask_info_conv{i}")
            for i in range(2)
        ]
        if self.with_semantic:
            self.semantic_head = SemanticHead(num_classes=c.num_classes,
                                              name="semantic_head")
            self.semantic_roi_conv = nn.Conv(
                c.neck_channels, (1, 1), name="semantic_roi_conv")
        if self.with_global_context:
            self.gc_fc = nn.Dense(c.neck_channels, name="gc_fc")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def rpn_forward(self, neck):
        return self.base.rpn_forward(neck)

    def semantic_forward(self, neck):
        return self.semantic_head(neck)

    def _fuse(self, rf, neck, sem_feat, rois, binds):
        """Fuse semantic roi features / global context into roi features."""
        if self.with_semantic and sem_feat is not None:
            sem_rf = roi_align(
                sem_feat.astype(jnp.float32), rois,
                spatial_scale=1.0 / self.cfg.stride, batch_inds=binds,
                out_size=rf.shape[1], sampling_ratio=2)
            rf = rf + self.semantic_roi_conv(sem_rf)
        if self.with_global_context:
            gc = jnp.mean(neck.astype(jnp.float32), axis=(0, 1))
            rf = rf + self.gc_fc(gc)[None, None, None, :]
        return rf

    def roi_feats(self, neck, sem_feat, rois, binds):
        rf = self.base.roi_feats(neck, rois, binds)
        return self._fuse(rf, neck, sem_feat, rois, binds)

    def mask_roi_feats(self, neck, sem_feat, rois, binds):
        rf = roi_align(
            neck.astype(jnp.float32), rois,
            spatial_scale=1.0 / self.cfg.stride, batch_inds=binds,
            out_size=14, sampling_ratio=2)
        return self._fuse(rf, neck, sem_feat, rois, binds)

    def stage_forward(self, stage: int, rf):
        return self.cascade_heads[stage](rf)

    def mask_forward(self, stage: int, mask_rf, prev_feat=None):
        """Mask information flow (htc_roi_head.py:186-204): stage i receives
        a conv of stage i-1's (pre-logit) mask features additively."""
        x = mask_rf
        if prev_feat is not None:
            x = x + nn.relu(self.mask_info_convs[stage - 1](prev_feat))
        logits = self.mask_heads[stage](x)
        return logits, x

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck)
        sem = self.semantic_forward(neck[0]) if self.with_semantic else (None, None)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        binds = jnp.zeros((4,), jnp.int32)
        rf = self.roi_feats(neck[0], sem[1], rois, binds)
        outs = [self.stage_forward(i, rf) for i in range(3)]
        mrf = self.mask_roi_feats(neck[0], sem[1], rois, binds)
        prev = None
        mlogits = []
        for i in range(3):
            lg, prev = self.mask_forward(i, mrf, prev)
            mlogits.append(lg)
        return cls, reg, outs, mlogits, sem[0]


def _semantic_target(gt_masks, gt_labels, gt_valid, hw):
    """Per-pixel class map from instance masks (background = num_classes...
    encoded as channel 0-shifted: label+1; 0 = background)."""
    h, w = hw
    tgt = jnp.zeros(gt_masks.shape[1:], jnp.int32)
    for_each = jnp.where(gt_valid[:, None, None],
                         gt_masks > 0.5, False)
    lab = jnp.where(gt_valid, gt_labels + 1, 0)
    # later instances overwrite earlier (arbitrary but deterministic)
    for i in range(gt_masks.shape[0]):
        tgt = jnp.where(for_each[i], lab[i], tgt)
    small = jax.image.resize(tgt.astype(jnp.float32), (h, w), "nearest")
    return small.astype(jnp.int32)


def htc_loss(model: HTC, params, batch: MaskTrainBatch, rng: jax.Array,
             anchors):
    cfg = model.cfg
    rngs = jax.random.split(rng, 5)
    _, neck = model.apply(params, batch.img[None], method=HTC.extract_feat)
    cls, reg = model.apply(params, neck, method=HTC.rpn_forward)
    rpn_losses = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                              batch.gt_valid, rngs[0], batch.img_shape)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    total = rpn_losses.loss_cls + rpn_losses.loss_bbox
    metrics = {"loss_rpn_cls": rpn_losses.loss_cls,
               "loss_rpn_bbox": rpn_losses.loss_bbox}

    sem_feat = None
    if model.with_semantic:
        sem_logits, sem_feat = model.apply(params, neck[0],
                                           method=HTC.semantic_forward)
        sh, sw = sem_logits.shape[0], sem_logits.shape[1]
        sem_tgt = _semantic_target(batch.gt_masks.astype(jnp.float32),
                                   batch.gt_labels, batch.gt_valid, (sh, sw))
        logp = jax.nn.log_softmax(sem_logits, axis=-1)
        loss_sem = -jnp.mean(
            jnp.take_along_axis(logp, sem_tgt[..., None], axis=-1))
        total = total + 0.2 * loss_sem
        metrics["loss_semantic"] = loss_sem

    from ...core import assigners

    boxes, valid = props.boxes, props.valid
    prev_mask_feat = None
    for st in range(3):
        tgts = bh.bbox_targets(
            boxes, valid, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
            rngs[st + 1], num_classes=cfg.num_classes,
            num_samples=cfg.num_roi_samples,
            pos_iou_thr=STAGE_IOUS[st], neg_iou_thr=STAGE_IOUS[st],
            min_pos_iou=STAGE_IOUS[st], stds=STAGE_STDS[st],
            add_gt_as_proposals=(st == 0))
        binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
        rf = model.apply(params, neck[0], sem_feat, tgts.rois, binds,
                         method=HTC.roi_feats)
        cls_score, bbox_pred = model.apply(params, st, rf,
                                           method=HTC.stage_forward)
        sl = bh.bbox_loss(cls_score, bbox_pred, tgts,
                          num_classes=cfg.num_classes,
                          reg_class_agnostic=True)
        w = STAGE_WEIGHTS[st]
        total = total + w * (sl.loss_cls + sl.loss_bbox)
        metrics[f"s{st}.loss_cls"] = sl.loss_cls

        # interleaved mask branch on the SAME sampled rois
        mrf = model.apply(params, neck[0], sem_feat, tgts.rois, binds,
                          method=HTC.mask_roi_feats)
        mlogits, prev_mask_feat = model.apply(
            params, st, mrf, prev_mask_feat, method=HTC.mask_forward)
        assign = assigners.max_iou_assign(
            tgts.rois, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5)
        matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                           batch.gt_boxes.shape[0] - 1)
        m_tgt = mask_targets(batch.gt_masks.astype(jnp.float32), matched,
                             tgts.rois, mask_size=mlogits.shape[1])
        lm = mask_loss(mlogits, m_tgt, tgts.labels, tgts.is_pos)
        total = total + w * lm
        metrics[f"s{st}.loss_mask"] = lm
        prev_mask_feat = jax.lax.stop_gradient(prev_mask_feat)

        refined = box_ops.delta2bbox(
            tgts.rois, bbox_pred.astype(jnp.float32), stds=STAGE_STDS[st],
            max_shape=batch.img_shape)
        boxes = jax.lax.stop_gradient(refined)
        valid = tgts.label_weights > 0
    metrics["loss"] = total
    return total, metrics


def htc_detect(model: HTC, params, img: jnp.ndarray, img_shape, anchors,
               scale_factor=None):
    """Cascade inference with semantic fusion + mask info flow
    (reference htc_roi_head.py simple_test: 3-stage refinement, averaged
    stage scores, masks from every stage averaged on the final boxes).
    Returns (DetResult, masks [max_num, mh, mw, C] sigmoid probs)."""
    cfg = model.cfg
    _, neck = model.apply(params, img[None], method=HTC.extract_feat)
    cls, reg = model.apply(params, neck, method=HTC.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    sem_feat = None
    if model.with_semantic:
        _, sem_feat = model.apply(params, neck[0], method=HTC.semantic_forward)

    boxes = props.boxes
    binds = jnp.zeros((boxes.shape[0],), jnp.int32)
    scores_sum = 0.0
    for st in range(3):
        rf = model.apply(params, neck[0], sem_feat, boxes, binds,
                         method=HTC.roi_feats)
        cls_score, bbox_pred = model.apply(params, st, rf,
                                           method=HTC.stage_forward)
        scores_sum = scores_sum + jax.nn.softmax(
            cls_score.astype(jnp.float32), axis=-1)
        if st < 2:
            boxes = box_ops.delta2bbox(
                boxes, bbox_pred.astype(jnp.float32), stds=STAGE_STDS[st],
                max_shape=img_shape)
    decoded = box_ops.delta2bbox(
        boxes, bbox_pred.astype(jnp.float32), stds=STAGE_STDS[2],
        max_shape=img_shape)
    if scale_factor is not None:
        decoded = decoded / jnp.asarray(scale_factor)
    dets = nms_ops.multiclass_nms(
        decoded, scores_sum / 3.0, score_thr=1e-4, iou_threshold=0.5,
        max_num=100, box_valid=props.valid)

    # mask info flow on the kept boxes, stages averaged
    dbinds = jnp.zeros((dets.boxes.shape[0],), jnp.int32)
    mrf = model.apply(params, neck[0], sem_feat, dets.boxes, dbinds,
                      method=HTC.mask_roi_feats)
    prev = None
    probs_sum = 0.0
    for st in range(3):
        mlogits, prev = model.apply(params, st, mrf, prev,
                                    method=HTC.mask_forward)
        probs_sum = probs_sum + jax.nn.sigmoid(mlogits.astype(jnp.float32))
    return dets, probs_sum / 3.0


class SCNet(HTC):
    """SCNet = HTC cascade + global-context branch (scnet.py)."""

    with_global_context: bool = True


def make_htc(cfg: Optional[SelsaConfig] = None, scnet: bool = False):
    cfg = cfg or SelsaConfig()
    model = (SCNet if scnet else HTC)(cfg=cfg)
    return model, make_anchors(cfg)
