"""Double-Head, Dynamic and PISA R-CNN roi-head families.

Parity targets (all in mmdetection/mmdet/models/roi_heads/):
- ``DoubleHeadRoIHead`` (double_roi_head.py:1) + ``DoubleConvFCBBoxHead``
  (bbox_heads/double_bbox_head.py:70): a conv branch (BasicResBlock +
  ``num_convs`` Bottlenecks + global avg-pool) regresses boxes from RoI
  features re-extracted at ``reg_roi_scale_factor`` (1.3), while an fc
  branch (2 fcs) classifies from the unscaled RoI features; both losses
  weighted 2.0 (configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py).
- ``DynamicRoIHead`` (dynamic_roi_head.py:1, Dynamic R-CNN): the assigner
  IoU threshold and SmoothL1 beta ADAPT during training to the statistics
  of the proposal distribution — per iteration the head records the
  ``iou_topk``-th best IoU and the ``beta_topk``-th smallest positive
  regression error; every ``update_iter_interval`` iterations the IoU
  threshold becomes max(initial_iou, mean(iou_history)) and beta becomes
  min(initial_beta, median(beta_history)).
- ``PISARoIHead`` (pisa_roi_head.py:1) with the ScoreHLRSampler
  (core/bbox/samplers/score_hlr_sampler.py:1), ISR-P and CARL
  (models/losses/pisa_loss.py:1): negatives are sampled and down-weighted
  by Score-HLR (ISR-N), positive classification is re-weighted by IoU-HLR
  (ISR-P), and a classification-aware regression loss (CARL) couples the
  two branches. Config: configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py
  (sampler k=0.5 bias=0, isr k=2 bias=0, carl k=1 bias=0.2).

TPU-first notes: Dynamic R-CNN's mutable ``iou_history``/``beta_history``
state becomes an explicit host-side :class:`DynamicSchedule` fed by
per-step batch statistics returned in the metrics pytree, so the compiled
step stays pure — the (iou_thr, beta) pair is passed INTO the jitted loss
as traced scalars and the graph is compiled once. The ISR ranks are
masked double-argsorts (no per-class python loops).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import assigners, boxes as box_ops, losses, nms as nms_ops
from ..backbones.resnet import Bottleneck, FrozenBatchNorm
from ..dense_heads import rpn_head as rpn
from ..roi_heads import bbox_head as bh
from ..vid.selsa import SelsaConfig, make_anchors
from .faster_rcnn import DetTrainBatch, FasterRCNN


def roi_rescale(rois: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Scale rois around their centers (base_roi_extractor.roi_rescale)."""
    cx = (rois[:, 0] + rois[:, 2]) * 0.5
    cy = (rois[:, 1] + rois[:, 3]) * 0.5
    w = (rois[:, 2] - rois[:, 0]) * scale_factor
    h = (rois[:, 3] - rois[:, 1]) * scale_factor
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


# ---------------------------------------------------------------------------
# Double-Head R-CNN
# ---------------------------------------------------------------------------

# dh config: DoubleConvFCBBoxHead stds + loss weights
DH_STDS = (0.1, 0.1, 0.2, 0.2)
DH_LOSS_WEIGHT = 2.0
DH_REG_ROI_SCALE = 1.3


class BasicResBlock(nn.Module):
    """double_bbox_head.py:9 BasicResBlock: 3x3(BN,relu) -> 1x1(BN) main
    path + 1x1(BN) identity projection, summed, relu."""

    out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        y = nn.Conv(cin, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2")(y)
        idn = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                      name="conv_identity")(x)
        idn = FrozenBatchNorm(dtype=self.dtype, name="bn_identity")(idn)
        return nn.relu(y + idn)


class DoubleConvFCBBoxHead(nn.Module):
    """double_bbox_head.py:70: conv branch -> reg, fc branch -> cls."""

    num_classes: int = 80
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls, x_reg):
        """x_cls/x_reg: [N, 7, 7, C] RoI features (reg from 1.3x rois).
        Returns (cls_score [N, C+1], bbox_pred [N, 4C])."""
        # conv branch on the rescaled-roi features
        y = BasicResBlock(out_channels=self.conv_out_channels,
                          dtype=self.dtype, name="res_block")(
            x_reg.astype(self.dtype))
        for i in range(self.num_convs):
            y = Bottleneck(planes=self.conv_out_channels // 4,
                           dtype=self.dtype, name=f"conv_branch{i}")(y)
        y = jnp.mean(y, axis=(-3, -2))  # global avg pool
        bbox_pred = nn.Dense(4 * self.num_classes, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001),
                             name="fc_reg")(y)

        # fc branch on the plain-roi features
        z = x_cls.reshape(x_cls.shape[0], -1).astype(self.dtype)
        for i in range(self.num_fcs):
            z = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc_branch{i}")(z))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(z)
        return cls_score, bbox_pred


class DoubleHeadRCNN(nn.Module):
    """Faster R-CNN trunk + DoubleConvFCBBoxHead (double_roi_head.py:1)."""

    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.base = FasterRCNN(cfg=self.cfg, name="base")
        self.double_head = DoubleConvFCBBoxHead(
            num_classes=self.cfg.num_classes, name="double_head")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def rpn_forward(self, neck_feat):
        return self.base.rpn_forward(neck_feat)

    def bbox_forward(self, neck_feat, rois, batch_inds):
        """The _bbox_forward of double_roi_head.py:16-32: cls feats from the
        rois, reg feats from the SAME rois rescaled 1.3x."""
        cls_feats = self.base.roi_feats(neck_feat, rois, batch_inds)
        reg_feats = self.base.roi_feats(
            neck_feat, roi_rescale(rois, DH_REG_ROI_SCALE), batch_inds)
        return self.double_head(cls_feats, reg_feats)

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        binds = jnp.zeros((4,), jnp.int32)
        return cls, reg, self.bbox_forward(neck[0], rois, binds)


def double_head_loss(model: DoubleHeadRCNN, params, batch: DetTrainBatch,
                     rng: jax.Array, anchors):
    """RPN + double-head losses, both roi losses weighted 2.0 and targets
    with stds (0.1, 0.1, 0.2, 0.2) (dh config)."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.img[None],
                          method=DoubleHeadRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=DoubleHeadRCNN.rpn_forward)
    ls = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                      batch.gt_valid, rng_rpn, batch.img_shape)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    tgts = bh.bbox_targets(
        props.boxes, props.valid, batch.gt_boxes, batch.gt_labels,
        batch.gt_valid, rng_roi, num_classes=cfg.num_classes,
        num_samples=cfg.num_roi_samples, stds=DH_STDS)
    binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    cls_score, bbox_pred = model.apply(params, neck[0], tgts.rois, binds,
                                       method=DoubleHeadRCNN.bbox_forward)
    roi = bh.bbox_loss(cls_score, bbox_pred, tgts,
                       num_classes=cfg.num_classes)
    total = (ls.loss_cls + ls.loss_bbox
             + DH_LOSS_WEIGHT * (roi.loss_cls + roi.loss_bbox))
    return total, {"loss": total, "loss_rpn_cls": ls.loss_cls,
                   "loss_rpn_bbox": ls.loss_bbox,
                   "loss_cls": DH_LOSS_WEIGHT * roi.loss_cls,
                   "loss_bbox": DH_LOSS_WEIGHT * roi.loss_bbox,
                   "acc": roi.acc}


def double_head_detect(model: DoubleHeadRCNN, params, img, img_shape,
                       anchors, scale_factor=None):
    cfg = model.cfg
    _, neck = model.apply(params, img[None],
                          method=DoubleHeadRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=DoubleHeadRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    binds = jnp.zeros((props.boxes.shape[0],), jnp.int32)
    cls_score, bbox_pred = model.apply(params, neck[0], props.boxes, binds,
                                       method=DoubleHeadRCNN.bbox_forward)
    return bh.bbox_decode(props.boxes, cls_score, bbox_pred, img_shape,
                          roi_valid=props.valid, scale_factor=scale_factor,
                          stds=DH_STDS)


# ---------------------------------------------------------------------------
# Dynamic R-CNN
# ---------------------------------------------------------------------------

# dynamic_rcnn config (configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py)
DYN_IOU_TOPK = 75
DYN_BETA_TOPK = 10
DYN_UPDATE_INTERVAL = 100
DYN_INITIAL_IOU = 0.4
DYN_INITIAL_BETA = 1.0
DYN_RPN_NMS_IOU = 0.85
DYN_EPS = 1e-15


class DynamicSchedule:
    """Host-side replica of DynamicRoIHead's mutable hyperparameter state
    (dynamic_roi_head.py:20-22 + update_hyperparameters :139-160).

    Feed each step's ``batch_iou`` / ``batch_beta`` metrics via
    :meth:`record`; read the current (iou_thr, beta) to pass into the
    jitted loss. Every ``update_iter_interval`` records the thresholds
    update exactly as the reference: iou_thr = max(initial_iou,
    mean(iou_history)); beta = min(initial_beta, median(beta_history))
    unless the median is ~0 (then beta is kept).
    """

    def __init__(self, initial_iou=DYN_INITIAL_IOU,
                 initial_beta=DYN_INITIAL_BETA,
                 update_iter_interval=DYN_UPDATE_INTERVAL):
        self.initial_iou = initial_iou
        self.initial_beta = initial_beta
        self.interval = update_iter_interval
        self.iou_thr = initial_iou
        self.beta = initial_beta
        self.iou_history = []
        self.beta_history = []

    def record(self, batch_iou: float, batch_beta: float):
        self.iou_history.append(float(batch_iou))
        self.beta_history.append(float(batch_beta))
        if len(self.iou_history) % self.interval == 0:
            self.iou_thr = max(self.initial_iou,
                               float(np.mean(self.iou_history)))
            med = float(np.median(self.beta_history))
            if med >= DYN_EPS:
                self.beta = min(self.initial_beta, med)
            self.iou_history = []
            self.beta_history = []
        return self.iou_thr, self.beta


def dynamic_rcnn_loss(model: FasterRCNN, params, batch: DetTrainBatch,
                      rng: jax.Array, anchors,
                      iou_thr=DYN_INITIAL_IOU, beta=DYN_INITIAL_BETA):
    """Dynamic R-CNN training loss (dynamic_roi_head.py:24-137).

    ``iou_thr`` and ``beta`` are the CURRENT dynamic hyperparameters
    (traced scalars — one compilation serves the whole schedule). Returns
    the loss and metrics including ``batch_iou`` (the iou_topk-th largest
    candidate IoU) and ``batch_beta`` (the beta_topk-th smallest positive
    xy-regression error) for :class:`DynamicSchedule`.
    """
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.img[None],
                          method=FasterRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=FasterRCNN.rpn_forward)
    ls = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                      batch.gt_valid, rng_rpn, batch.img_shape)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=DYN_RPN_NMS_IOU)

    cand = jnp.concatenate([batch.gt_boxes, props.boxes], axis=0)
    cand_valid = jnp.concatenate([batch.gt_valid, props.valid], axis=0)
    assign = assigners.max_iou_assign(
        cand, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        pos_iou_thr=iou_thr, neg_iou_thr=iou_thr, min_pos_iou=iou_thr,
        box_valid=cand_valid)
    # the iou_topk-th largest IoU among VALID candidates (:79-82 —
    # iou_topk = min(cfg.iou_topk, len(max_overlaps)); padded-invalid rows
    # must not leak their -1 sentinel into the statistic)
    iou_sorted = -jnp.sort(-jnp.where(cand_valid, assign.max_overlaps, -1.0))
    kth_iou = jnp.clip(
        jnp.minimum(DYN_IOU_TOPK, jnp.sum(cand_valid)) - 1, 0,
        cand.shape[0] - 1)
    top_iou = jnp.clip(iou_sorted[kth_iou], 0.0, 1.0)

    sample = assigners.random_sample_gather(assign, rng_roi,
                                            cfg.num_roi_samples, 0.25)
    rois = cand[sample.inds]
    matched = jnp.clip(assign.assigned_gt_inds[sample.inds] - 1, 0,
                       batch.gt_boxes.shape[0] - 1)
    pos = sample.is_pos
    labels = jnp.where(pos, batch.gt_labels[matched],
                       cfg.num_classes).astype(jnp.int32)
    tgt = box_ops.bbox2delta(rois, batch.gt_boxes[matched],
                             stds=(0.1, 0.1, 0.2, 0.2))
    tgt = jnp.where(pos[:, None], tgt, 0.0)
    tgts = bh.BBoxTargets(rois, labels, sample.is_valid.astype(jnp.float32),
                          tgt, pos.astype(jnp.float32), pos)

    binds = jnp.zeros((rois.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], rois, binds,
                     method=FasterRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf,
                                       method=FasterRCNN.bbox_forward)

    avg = jnp.maximum(jnp.sum(tgts.label_weights), 1.0)
    loss_cls = losses.softmax_cross_entropy(
        cls_score.astype(jnp.float32), labels,
        weight=tgts.label_weights, avg_factor=avg)
    pred = bbox_pred.reshape(-1, cfg.num_classes, 4).astype(jnp.float32)
    cls_idx = jnp.clip(labels, 0, cfg.num_classes - 1)
    pred_c = jnp.take_along_axis(pred, cls_idx[:, None, None], axis=1)[:, 0]
    # dynamic SmoothL1 beta (traced)
    loss_bbox = losses.smooth_l1_loss(
        pred_c, tgt, beta=beta, weight=pos[:, None].astype(jnp.float32),
        avg_factor=avg)

    # the beta_topk-th smallest mean |xy target| among positives (:117-124);
    # ascending sort with +inf padding, dynamic index min(topk, num_pos)-1
    err = jnp.mean(jnp.abs(tgt[:, :2]), axis=-1)
    err_sorted = jnp.sort(jnp.where(pos, err, jnp.inf))
    kth = jnp.clip(jnp.minimum(DYN_BETA_TOPK, jnp.sum(pos)) - 1, 0,
                   err.shape[0] - 1)
    batch_beta = err_sorted[kth]
    batch_beta = jnp.where(jnp.isfinite(batch_beta), batch_beta, 0.0)

    total = ls.loss_cls + ls.loss_bbox + loss_cls + loss_bbox
    return total, {"loss": total, "loss_rpn_cls": ls.loss_cls,
                   "loss_rpn_bbox": ls.loss_bbox, "loss_cls": loss_cls,
                   "loss_bbox": loss_bbox, "batch_iou": top_iou,
                   "batch_beta": batch_beta}


def dynamic_rcnn_detect(model: FasterRCNN, params, img, img_shape, anchors,
                        scale_factor=None):
    """Test path: standard Faster R-CNN with the 0.85 RPN NMS threshold and
    (0.1, 0.1, 0.2, 0.2) stds (dynamic_rcnn config test_cfg)."""
    cfg = model.cfg
    _, neck = model.apply(params, img[None], method=FasterRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=FasterRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=DYN_RPN_NMS_IOU)
    binds = jnp.zeros((props.boxes.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], props.boxes, binds,
                     method=FasterRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf,
                                       method=FasterRCNN.bbox_forward)
    return bh.bbox_decode(props.boxes, cls_score, bbox_pred, img_shape,
                          roi_valid=props.valid, scale_factor=scale_factor,
                          stds=(0.1, 0.1, 0.2, 0.2))


# ---------------------------------------------------------------------------
# PISA two-stage (ScoreHLR sampling + ISR-P + CARL)
# ---------------------------------------------------------------------------


def isr_p_roi_weights(labels, gts, ious, pos, label_weights, cls_score,
                      num_classes, k: float = 2.0, bias: float = 0.0):
    """Exact two-stage ISR-P label re-weighting (pisa_loss.py:8-118).

    Two-step IoU-HLR: within each (class, gt) group rank by IoU
    (descending), add ``max_l_num - rank`` to the IoU; then rank the
    adjusted values within each class. The positive label weight becomes
    ``label_weight * (max_l_num - class_rank)/max_l_num`` mapped through
    ``(bias + w*(1-bias))^k`` and normalized so the positive CE sum is
    unchanged. ``gts``: matched gt index per sample; ``ious``: IoU of the
    decoded prediction vs the decoded target.
    """
    s = labels.shape[0]
    lab = jnp.where(pos, jnp.clip(labels, 0, num_classes - 1), num_classes)
    ngt = jnp.max(jnp.where(pos, gts, 0)) + 1

    # per-class positive counts -> max_l_num
    cls_n = jax.ops.segment_sum(pos.astype(jnp.int32), lab,
                                num_segments=num_classes + 1)
    max_l_num = jnp.maximum(
        jnp.max(cls_n.at[num_classes].set(0)), 1).astype(jnp.float32)

    def _within_rank(seg_id, value, live):
        """Rank (0-based, descending by value) within each segment."""
        key = seg_id.astype(jnp.float32) * 4.0 - jnp.clip(value, 0.0, 1.0)
        key = jnp.where(live, key, jnp.inf)
        grank = jnp.argsort(jnp.argsort(key)).astype(jnp.int32)
        start = jax.ops.segment_min(
            jnp.where(live, grank, jnp.iinfo(jnp.int32).max),
            jnp.where(live, seg_id, 0), num_segments=s + 1)
        return (grank - start[jnp.where(live, seg_id, 0)]).astype(jnp.float32)

    # step 1: rank within (class, gt) group
    grp = lab * jnp.maximum(ngt, 1) + jnp.where(pos, gts, 0)
    r1 = _within_rank(grp, ious, pos)
    ious2 = jnp.clip(ious, 0.0, 1.0) + (max_l_num - r1)

    # step 2: rank the adjusted IoUs within the class; ious2 in
    # [0, max_l_num + 1] so a spacing of 2*(s+2) separates classes
    key2 = lab.astype(jnp.float32) * (2.0 * (s + 2)) - ious2
    key2 = jnp.where(pos, key2, jnp.inf)
    grank2 = jnp.argsort(jnp.argsort(key2)).astype(jnp.int32)
    start2 = jax.ops.segment_min(
        jnp.where(pos, grank2, jnp.iinfo(jnp.int32).max),
        jnp.where(pos, lab, 0), num_segments=num_classes + 1)
    l_rank = (grank2 - start2[jnp.where(pos, lab, 0)]).astype(jnp.float32)

    w = label_weights * (max_l_num - l_rank) / max_l_num
    w = (bias + w * (1.0 - bias)) ** k

    # normalize: weighted positive CE sum == original positive CE sum
    ce = -jnp.take_along_axis(
        jax.nn.log_softmax(cls_score.astype(jnp.float32), -1),
        jnp.clip(labels, 0, num_classes)[:, None], axis=-1)[:, 0]
    ori = jnp.sum(jnp.where(pos, ce * label_weights, 0.0))
    new = jnp.maximum(jnp.sum(jnp.where(pos, ce * w, 0.0)), 1e-12)
    w = w * ori / new
    return jnp.where(pos, w, label_weights)


def pisa_roi_loss(model: FasterRCNN, params, batch: DetTrainBatch,
                  rng: jax.Array, anchors,
                  isr_k: float = 2.0, isr_bias: float = 0.0,
                  carl_k: float = 1.0, carl_bias: float = 0.2):
    """PISA two-stage training loss (pisa_roi_head.py:1 + the pisa config).

    ScoreHLR negative sampling needs the head's scores on every candidate,
    so the bbox head runs twice: once DETACHED over all candidates (the
    sampler context forward, score_hlr_sampler.py:134-139) and once with
    gradients over the sampled rois.
    """
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.img[None],
                          method=FasterRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=FasterRCNN.rpn_forward)
    ls = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                      batch.gt_valid, rng_rpn, batch.img_shape)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou)

    cand = jnp.concatenate([batch.gt_boxes, props.boxes], axis=0)
    cand_valid = jnp.concatenate([batch.gt_valid, props.valid], axis=0)
    assign = assigners.max_iou_assign(
        cand, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        0.5, 0.5, 0.5, box_valid=cand_valid)

    # detached context forward over ALL candidates for ScoreHLR
    binds_all = jnp.zeros((cand.shape[0],), jnp.int32)
    rf_all = model.apply(params, neck[0], cand, binds_all,
                         method=FasterRCNN.roi_feats)
    cs_all, bp_all = model.apply(params, rf_all,
                                 method=FasterRCNN.bbox_forward)
    cs_all = jax.lax.stop_gradient(cs_all.astype(jnp.float32))
    bp_all = jax.lax.stop_gradient(bp_all.astype(jnp.float32))
    probs = jax.nn.softmax(cs_all, -1)
    max_score = jnp.max(probs[:, :-1], axis=-1)
    arg_score = jnp.argmax(probs[:, :-1], axis=-1)
    bp_c = jnp.take_along_axis(bp_all.reshape(-1, cfg.num_classes, 4),
                               arg_score[:, None, None], axis=1)[:, 0]
    pred_boxes = box_ops.delta2bbox(cand, bp_c, stds=bh.BBOX_STDS)
    neg_ce = -jax.nn.log_softmax(cs_all, -1)[:, cfg.num_classes]

    sample, neg_w = assigners.score_hlr_sample_gather(
        assign, rng_roi, cfg.num_roi_samples, 0.25,
        neg_max_score=jnp.where(cand_valid, max_score, 0.0),
        pred_boxes=pred_boxes, neg_ce_loss=neg_ce)

    rois = cand[sample.inds]
    matched = jnp.clip(assign.assigned_gt_inds[sample.inds] - 1, 0,
                       batch.gt_boxes.shape[0] - 1)
    pos = sample.is_pos
    labels = jnp.where(pos, batch.gt_labels[matched],
                       cfg.num_classes).astype(jnp.int32)
    tgt = box_ops.bbox2delta(rois, batch.gt_boxes[matched],
                             stds=bh.BBOX_STDS)
    tgt = jnp.where(pos[:, None], tgt, 0.0)
    label_w = sample.is_valid.astype(jnp.float32) * neg_w

    binds = jnp.zeros((rois.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], rois, binds,
                     method=FasterRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf,
                                       method=FasterRCNN.bbox_forward)
    pred = bbox_pred.reshape(-1, cfg.num_classes, 4).astype(jnp.float32)
    cls_idx = jnp.clip(labels, 0, cfg.num_classes - 1)
    pred_c = jnp.take_along_axis(pred, cls_idx[:, None, None], axis=1)[:, 0]

    # ISR-P: IoU of decoded prediction vs decoded target per positive
    dec_pred = box_ops.delta2bbox(rois, jax.lax.stop_gradient(pred_c),
                                  stds=bh.BBOX_STDS)
    dec_tgt = box_ops.delta2bbox(rois, tgt, stds=bh.BBOX_STDS)
    ious = _aligned_iou(dec_pred, dec_tgt)
    label_w = isr_p_roi_weights(
        labels, matched, ious, pos, label_w,
        jax.lax.stop_gradient(cls_score), cfg.num_classes,
        k=isr_k, bias=isr_bias)

    avg = jnp.maximum(jnp.sum(sample.is_valid), 1.0)
    loss_cls = losses.softmax_cross_entropy(
        cls_score.astype(jnp.float32), labels, weight=label_w,
        avg_factor=avg)
    loss_bbox = losses.smooth_l1_loss(
        pred_c, tgt, beta=1.0, weight=pos[:, None].astype(jnp.float32),
        avg_factor=avg)

    # CARL (pisa_loss.py:120-183): reg loss re-weighted by the (live)
    # softmax prob of the target class, normalized to the positive count
    p_lab = jnp.take_along_axis(
        jax.nn.softmax(cls_score.astype(jnp.float32), -1),
        cls_idx[:, None], axis=-1)[:, 0]
    carl_w = (carl_bias + (1.0 - carl_bias) * p_lab) ** carl_k
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    carl_w = carl_w * num_pos / jnp.maximum(
        jnp.sum(jnp.where(pos, carl_w, 0.0)), 1e-6)
    l1 = jnp.where(jnp.abs(pred_c - tgt) < 1.0,
                   0.5 * (pred_c - tgt) ** 2, jnp.abs(pred_c - tgt) - 0.5)
    loss_carl = jnp.sum(jnp.sum(l1, -1) * carl_w * pos) / avg

    total = ls.loss_cls + ls.loss_bbox + loss_cls + loss_bbox + loss_carl
    return total, {"loss": total, "loss_rpn_cls": ls.loss_cls,
                   "loss_rpn_bbox": ls.loss_bbox, "loss_cls": loss_cls,
                   "loss_bbox": loss_bbox, "loss_carl": loss_carl}


def _aligned_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-aligned IoU (bbox_overlaps(..., is_aligned=True))."""
    lt = jnp.maximum(a[:, :2], b[:, :2])
    rb = jnp.minimum(a[:, 2:], b[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)


# PISA's test path is the plain Faster R-CNN one (pisa only changes
# training) — families dispatch reuses faster_rcnn_detect.
