"""The remaining mmdet R-CNN detector families.

Parity targets (all in mmdetection/mmdet/models/detectors/):
- ``FastRCNN`` (fast_rcnn.py): Faster R-CNN driven by PRECOMPUTED proposals
  (no RPN) — the detector Tracktor regresses with, and the classic two-step
  train flow.
- ``RPN`` (rpn.py): standalone region proposal network; trains with the RPN
  loss only and emits scored class-agnostic proposals (proposal-recall eval).
- ``MaskScoringRCNN`` (mask_scoring_rcnn.py + roi_heads/mask_heads/
  maskiou_head.py): Mask R-CNN + a MaskIoU head regressing each predicted
  mask's IoU with its gt; at test time the mask score is cls_score * miou.
- ``PointRendRCNN`` (point_rend.py + roi_heads/point_rend_roi_head.py):
  Mask R-CNN whose coarse mask is refined at the most uncertain points with
  an MLP over fine-grained point features (ops/point_sample).
- ``TridentFasterRCNN`` (trident_faster_rcnn.py): Faster R-CNN over the
  TridentResNet 3-branch backbone; branches fold into the batch axis at
  train time and the middle branch serves at test time.
- ``GridRCNN`` (grid_rcnn.py + roi_heads/mask_heads/grid_head.py): replaces
  box regression with 9-point grid heatmap localization — the exact
  reference head: 8 GN convs, first/second-order neighbor fusion (5x5
  depthwise + 1x1 transitions), grouped deconvs to 28x28 per-point
  sub-heatmaps of the 56x56 whole map, circle targets on 2x-expanded
  jittered rois, and score-weighted boundary voting at decode.

All reuse the Faster R-CNN trunk and the static-shape target machinery;
each has a loss and a jittable detect path, smoke-tested in
tests/test_more_rcnn_families.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses as L, nms as nms_ops
from ...ops.point_sample import point_sample
from ...ops.roi_align import roi_align
from ..dense_heads import rpn_head as rpn
from ..roi_heads import bbox_head as bh
from ..roi_heads.mask_head import (
    FCNMaskHead, mask_iou_targets, mask_loss, mask_targets, paste_masks,
)


def _roi_mask_targets(batch, tgts, mask_size=28, return_matched=False):
    """Matched-gt mask crops per sampled roi (mask_rcnn.py:106-117 recipe)."""
    from ...core import assigners

    assign = assigners.max_iou_assign(
        tgts.rois, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
    )
    matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                       batch.gt_boxes.shape[0] - 1)
    m_tgts = mask_targets(batch.gt_masks.astype(jnp.float32), matched,
                          tgts.rois, mask_size=mask_size)
    if return_matched:
        return m_tgts, matched
    return m_tgts
from ..vid.selsa import SelsaConfig, make_anchors
from .faster_rcnn import DetTrainBatch, FasterRCNN
from .mask_rcnn import MaskRCNN, MaskTrainBatch, mask_rcnn_loss


# ---------------------------------------------------------------------------
# FastRCNN — precomputed proposals (fast_rcnn.py)
# ---------------------------------------------------------------------------


class FastRCNN(nn.Module):
    """Backbone + neck + bbox head; proposals come from outside."""

    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.base = FasterRCNN(cfg=self.cfg, name="base")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def roi_feats(self, neck_feat, rois, batch_inds):
        return self.base.roi_feats(neck_feat, rois, batch_inds)

    def bbox_forward(self, roi_feats):
        return self.base.bbox_forward(roi_feats)

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        rf = self.roi_feats(neck, jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4),
                            jnp.zeros((4,), jnp.int32))
        return self.bbox_forward(rf)


class FastRCNNBatch(NamedTuple):
    img: jnp.ndarray
    img_shape: jnp.ndarray
    proposals: jnp.ndarray  # [P, 4] precomputed
    proposals_valid: jnp.ndarray  # [P]
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray


def fast_rcnn_loss(model: FastRCNN, params, batch: FastRCNNBatch,
                   rng: jax.Array):
    cfg = model.cfg
    _, neck = model.apply(params, batch.img[None], method=FastRCNN.extract_feat)
    tgts = bh.bbox_targets(
        batch.proposals, batch.proposals_valid, batch.gt_boxes,
        batch.gt_labels, batch.gt_valid, rng, num_classes=cfg.num_classes,
        num_samples=cfg.num_roi_samples,
    )
    rf = model.apply(params, neck[0], tgts.rois,
                     jnp.zeros((tgts.rois.shape[0],), jnp.int32),
                     method=FastRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf, method=FastRCNN.bbox_forward)
    roi = bh.bbox_loss(cls_score, bbox_pred, tgts, num_classes=cfg.num_classes)
    total = roi.loss_cls + roi.loss_bbox
    return total, {"loss": total, "loss_cls": roi.loss_cls,
                   "loss_bbox": roi.loss_bbox, "acc": roi.acc}


def fast_rcnn_detect(model: FastRCNN, params, img, img_shape, proposals,
                     proposals_valid, scale_factor=None):
    _, neck = model.apply(params, img[None], method=FastRCNN.extract_feat)
    rf = model.apply(params, neck[0], proposals,
                     jnp.zeros((proposals.shape[0],), jnp.int32),
                     method=FastRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf, method=FastRCNN.bbox_forward)
    return bh.bbox_decode(proposals, cls_score, bbox_pred, img_shape,
                          roi_valid=proposals_valid,
                          scale_factor=scale_factor)


# ---------------------------------------------------------------------------
# RPN — standalone proposal network (rpn.py)
# ---------------------------------------------------------------------------


class RPN(nn.Module):
    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.base = FasterRCNN(cfg=self.cfg, name="base")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def rpn_forward(self, neck_feat):
        return self.base.rpn_forward(neck_feat)

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        return self.rpn_forward(neck)


def rpn_only_loss(model: RPN, params, batch: DetTrainBatch, rng: jax.Array,
                  anchors):
    _, neck = model.apply(params, batch.img[None], method=RPN.extract_feat)
    cls, reg = model.apply(params, neck, method=RPN.rpn_forward)
    ls = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                      batch.gt_valid, rng, batch.img_shape)
    total = ls.loss_cls + ls.loss_bbox
    return total, {"loss": total, "loss_rpn_cls": ls.loss_cls,
                   "loss_rpn_bbox": ls.loss_bbox}


def rpn_propose(model: RPN, params, img, img_shape, anchors):
    cfg = model.cfg
    _, neck = model.apply(params, img[None], method=RPN.extract_feat)
    cls, reg = model.apply(params, neck, method=RPN.rpn_forward)
    return rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )


# ---------------------------------------------------------------------------
# Mask Scoring R-CNN (mask_scoring_rcnn.py + maskiou_head.py)
# ---------------------------------------------------------------------------


class MaskIoUHead(nn.Module):
    """Conv stack on [mask feats ++ downsampled mask pred] -> per-class IoU
    (maskiou_head.py: 4 convs + 3 fcs; trimmed to the same shape at 1/2
    width — roi feats are 14x14 here)."""

    num_classes: int = 80
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, mask_feats, mask_pred):
        # mask_pred [N, 28, 28, C] -> matched-class channel pooled to 14x14
        pred = jax.image.resize(
            mask_pred, (mask_pred.shape[0], 14, 14, mask_pred.shape[-1]),
            "linear")
        pred_max = jnp.max(pred, axis=-1, keepdims=True)  # class-agnostic cue
        x = jnp.concatenate([mask_feats, pred_max], axis=-1)
        for i in range(2):
            x = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1)] * 2,
                                strides=(2, 2) if i == 1 else (1, 1),
                                dtype=self.dtype, name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc0")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc_iou")(x)


class MaskScoringRCNN(nn.Module):
    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.mask_rcnn = MaskRCNN(cfg=self.cfg, name="mask_rcnn")
        self.maskiou_head = MaskIoUHead(num_classes=self.cfg.num_classes,
                                        name="maskiou_head")

    def __call__(self, imgs):
        out = self.mask_rcnn(imgs)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        binds = jnp.zeros((4,), jnp.int32)
        _, neck = self.mask_rcnn.extract_feat(imgs)
        mf = self.mask_rcnn.mask_roi_feats(neck, rois, binds)
        mp = self.mask_rcnn.mask_forward(mf)
        miou = self.maskiou_head(mf, mp)
        return out, miou

    def mask_branch(self, neck, rois, binds):
        mf = self.mask_rcnn.mask_roi_feats(neck, rois, binds)
        mp = self.mask_rcnn.mask_forward(mf)
        return mf, mp, self.maskiou_head(mf, mp)


def mask_scoring_loss(model: MaskScoringRCNN, params, batch: MaskTrainBatch,
                      rng: jax.Array, anchors):
    """mask_rcnn losses + L2(miou_pred, actual mask IoU) on positives."""
    cfg = model.cfg

    # sub-module facade: a fresh MaskRCNN over the nested param subtree
    # (module attrs are not reachable outside apply in flax)
    sub = {c: t["mask_rcnn"] for c, t in params.items()}
    total, metrics = mask_rcnn_loss(MaskRCNN(cfg=cfg), sub, batch, rng,
                                    anchors)

    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(
        params, batch.img[None],
        method=lambda m, x: m.mask_rcnn.extract_feat(x))
    cls, reg = model.apply(
        params, neck, method=lambda m, nf: m.mask_rcnn.rpn_forward(nf))
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
    binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    _, mask_pred, miou_pred = model.apply(
        params, neck[0], tgts.rois, binds,
        method=MaskScoringRCNN.mask_branch)
    # IoU target of the thresholded predicted mask vs the WHOLE gt instance
    # (maskiou_head.py:101-175: the out-of-box part of the instance counts
    # in the union, via the in-box/full-instance area ratio)
    m_tgts, matched = _roi_mask_targets(
        batch, tgts, mask_size=mask_pred.shape[1], return_matched=True)
    cls_idx = jnp.clip(tgts.labels, 0, cfg.num_classes - 1)
    pred_c = (jax.nn.sigmoid(
        jnp.take_along_axis(
            mask_pred, cls_idx[:, None, None, None], axis=-1)[..., 0])
        > 0.5).astype(jnp.float32)
    actual_iou = mask_iou_targets(
        pred_c, (m_tgts > 0.5).astype(jnp.float32),
        batch.gt_masks.astype(jnp.float32), matched, tgts.rois)
    miou_c = jnp.take_along_axis(miou_pred, cls_idx[:, None], axis=-1)[:, 0]
    w = tgts.is_pos.astype(jnp.float32)
    loss_miou = 0.5 * jnp.sum(w * (miou_c - actual_iou) ** 2) / \
        jnp.maximum(w.sum(), 1.0)
    total = total + loss_miou
    metrics = dict(metrics)
    metrics.update(loss=total, loss_mask_iou=loss_miou)
    return total, metrics


# ---------------------------------------------------------------------------
# PointRend (point_rend.py)
# ---------------------------------------------------------------------------


class PointHead(nn.Module):
    """MLP over [fine point feature ++ coarse mask logit] (point_head.py)."""

    num_classes: int = 80

    @nn.compact
    def __call__(self, fine, coarse):
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(3):
            x = nn.relu(nn.Dense(256, name=f"fc{i}")(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, name="fc_logits")(x)


def uncertain_point_indices(mask_pred, labels, num_points):
    """Most-uncertain grid cells per roi (mask_point_head.py:187-205 +
    get_roi_rel_points_test): uncertainty = -|logit| of the roi's class
    channel (or the max channel when labels is None), static top-k.

    mask_pred: [N, mh, mw, C]; labels: [N] or None. Returns
    (idx [N, P] flat grid indices, unc [N, mh*mw])."""
    n, mh, mw, c = mask_pred.shape
    flat = mask_pred.reshape(n, mh * mw, c)
    if labels is None:
        cls_logit = jnp.max(flat, axis=-1)
    else:
        cls_idx = jnp.clip(labels, 0, c - 1)
        cls_logit = jnp.take_along_axis(
            flat, cls_idx[:, None, None], axis=-1)[..., 0]
    unc = -jnp.abs(cls_logit)
    _, idx = jax.lax.top_k(unc, num_points)
    return idx, unc


class PointRendRCNN(nn.Module):
    cfg: SelsaConfig = SelsaConfig()
    num_points: int = 49

    def setup(self):
        self.mask_rcnn = MaskRCNN(cfg=self.cfg, name="mask_rcnn")
        self.point_head = PointHead(num_classes=self.cfg.num_classes,
                                    name="point_head")

    def refine(self, neck, rois, binds, mask_pred, labels=None):
        """Refine each roi's coarse mask at its most uncertain points.

        Uncertainty = -|logit| of the roi's class channel (gt class at
        train, predicted class at test) — mask_point_head.py:187-205
        ``_get_uncertainty``; static top-k of num_points grid cells
        (the test-time ``get_roi_rel_points_test`` selection)."""
        n, mh, mw, c = mask_pred.shape
        flat = mask_pred.reshape(n, mh * mw, c)
        idx, _ = uncertain_point_indices(mask_pred, labels, self.num_points)
        py = (idx // mw + 0.5) / mh  # normalized roi coords [0, 1]
        px = (idx % mw + 0.5) / mw

        # point positions in image coords, then normalized to the padded
        # image for point_sample over the neck map
        x1, y1, x2, y2 = [rois[:, i] for i in range(4)]
        gx = x1[:, None] + px * (x2 - x1)[:, None]
        gy = y1[:, None] + py * (y2 - y1)[:, None]

        def per_roi(gxi, gyi, flat_i, idx_i):
            pts = jnp.stack([gxi / self.cfg.pad_w, gyi / self.cfg.pad_h],
                            axis=-1)
            fine = point_sample(neck.astype(jnp.float32), pts)
            coarse = flat_i[idx_i]
            return self.point_head(fine, coarse)

        refined = jax.vmap(per_roi)(gx, gy, flat, idx)  # [N, P, C]
        out = flat.at[jnp.arange(n)[:, None], idx].set(refined)
        return out.reshape(n, mh, mw, c), idx

    def mask_with_points(self, neck, rois, binds, labels=None):
        mf = self.mask_rcnn.mask_roi_feats(neck[None] if neck.ndim == 3
                                           else neck, rois, binds)
        mp = self.mask_rcnn.mask_forward(mf)
        return self.refine(neck if neck.ndim == 3 else neck[0], rois, binds,
                           mp, labels=labels)

    def __call__(self, imgs):
        _, neck = self.mask_rcnn.extract_feat(imgs)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        binds = jnp.zeros((4,), jnp.int32)
        out = self.mask_rcnn(imgs)
        refined, _ = self.mask_with_points(neck[0], rois, binds)
        return out, refined


def point_rend_loss(model: PointRendRCNN, params, batch: MaskTrainBatch,
                    rng: jax.Array, anchors):
    """mask_rcnn losses + point-BCE at the refined points."""
    cfg = model.cfg
    sub = {c: t["mask_rcnn"] for c, t in params.items()}
    total, metrics = mask_rcnn_loss(MaskRCNN(cfg=cfg), sub, batch, rng,
                                    anchors)

    _, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.img[None],
                          method=lambda m, x: m.mask_rcnn.extract_feat(x))
    cls, reg = model.apply(params, neck,
                           method=lambda m, nf: m.mask_rcnn.rpn_forward(nf))
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
    binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    refined, idx = model.apply(params, neck[0], tgts.rois, binds, tgts.labels,
                               method=PointRendRCNN.mask_with_points)
    m_tgts = _roi_mask_targets(batch, tgts, mask_size=refined.shape[1])
    n = refined.shape[0]
    flat_r = refined.reshape(n, -1, cfg.num_classes)
    flat_t = m_tgts.reshape(n, -1)
    cls_idx = jnp.clip(tgts.labels, 0, cfg.num_classes - 1)
    logit_pts = jnp.take_along_axis(
        jnp.take_along_axis(flat_r, idx[..., None], axis=1),
        jnp.broadcast_to(cls_idx[:, None, None], (n, idx.shape[1], 1)),
        axis=-1)[..., 0]
    tgt_pts = jnp.take_along_axis(flat_t, idx, axis=1)
    w = tgts.is_pos.astype(jnp.float32)[:, None]
    bce = jnp.maximum(logit_pts, 0) - logit_pts * tgt_pts + \
        jnp.log1p(jnp.exp(-jnp.abs(logit_pts)))
    loss_pt = jnp.sum(bce * w) / jnp.maximum(w.sum() * idx.shape[1], 1.0)
    total = total + loss_pt
    metrics = dict(metrics)
    metrics.update(loss=total, loss_point=loss_pt)
    return total, metrics


# ---------------------------------------------------------------------------
# Trident Faster R-CNN (trident_faster_rcnn.py)
# ---------------------------------------------------------------------------


class TridentFasterRCNN(nn.Module):
    """Faster R-CNN head stack over TridentResNet's 3 scale branches; the
    branch axis folds into the batch for RPN/RoI; test uses the middle
    branch (trident_faster_rcnn.py simple_test)."""

    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        from ..backbones.detectors_trident import TridentResNet

        c = self.cfg
        self.backbone = TridentResNet(depth=c.depth, dtype=c.compute_dtype,
                                      name="backbone")
        from ..necks.channel_mapper import ChannelMapper

        self.neck = ChannelMapper(out_channels=c.neck_channels, kernel_size=3,
                                  num_levels=1, dtype=c.compute_dtype,
                                  name="neck")
        self.rpn_head = rpn.RPNHead(
            feat_channels=c.neck_channels,
            num_base_anchors=c.num_base_anchors, dtype=c.compute_dtype,
            name="rpn_head")
        self.bbox_head = bh.Shared2FCBBoxHead(
            num_classes=c.num_classes, with_selsa=False, dtype=jnp.float32,
            name="bbox_head")

    def extract_feat(self, imgs):
        """[1, H, W, 3] -> branch-folded neck feats [3, h, w, C] (train) or
        [1, h, w, C] (single branch when the backbone is in test mode)."""
        feats = self.backbone(imgs)  # [B=3, 1, h, w, C] or [1, h, w, C]
        if feats.ndim == 5:
            feats = feats.reshape((-1,) + feats.shape[2:])
        elif feats.ndim == 4 and feats.shape[0] != 1:
            pass
        return self.neck([feats])[0]

    def rpn_forward(self, neck_feat):
        return self.rpn_head([neck_feat])[0]

    def roi_feats(self, neck_feat, rois, batch_inds):
        return roi_align(
            neck_feat.astype(jnp.float32), rois,
            spatial_scale=1.0 / self.cfg.stride, batch_inds=batch_inds,
            out_size=7, sampling_ratio=2)

    def bbox_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, imgs):
        neck = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck)
        rf = self.roi_feats(neck, jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4),
                            jnp.zeros((4,), jnp.int32))
        return cls, reg, self.bbox_forward(rf)


def trident_loss(model: TridentFasterRCNN, params, batch: DetTrainBatch,
                 rng: jax.Array, anchors):
    """Mean of per-branch Faster R-CNN losses (each branch sees the gts)."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    neck = model.apply(params, batch.img[None],
                       method=TridentFasterRCNN.extract_feat)  # [3, h, w, C]
    cls, reg = model.apply(params, neck,
                           method=TridentFasterRCNN.rpn_forward)
    n_branch = neck.shape[0]
    total = 0.0
    metrics = {}
    for b in range(n_branch):
        ls = rpn.rpn_loss([(cls[b], reg[b])], [anchors], batch.gt_boxes,
                          batch.gt_valid, jax.random.fold_in(rng_rpn, b),
                          batch.img_shape)
        props = rpn.rpn_proposals(
            [(cls[b], reg[b])], [anchors], batch.img_shape,
            nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
            iou_threshold=cfg.rpn_nms_iou)
        tgts = bh.bbox_targets(
            props.boxes, props.valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid, jax.random.fold_in(rng_roi, b),
            num_classes=cfg.num_classes, num_samples=cfg.num_roi_samples)
        rf = model.apply(params, neck[b], tgts.rois,
                         jnp.zeros((tgts.rois.shape[0],), jnp.int32),
                         method=TridentFasterRCNN.roi_feats)
        cs, bp = model.apply(params, rf,
                             method=TridentFasterRCNN.bbox_forward)
        roi = bh.bbox_loss(cs, bp, tgts, num_classes=cfg.num_classes)
        total = total + (ls.loss_cls + ls.loss_bbox + roi.loss_cls
                         + roi.loss_bbox) / n_branch
    metrics["loss"] = total
    return total, metrics


# ---------------------------------------------------------------------------
# Grid R-CNN (grid_rcnn.py + grid_head.py, reduced grid)
# ---------------------------------------------------------------------------


GRID_POINTS = 9
GRID_SIZE = 3
GRID_WHOLE = 56  # roi_feat_size(14) * 4 (grid_head.py:49 whole_map_size)
GRID_HALF = GRID_WHOLE // 4 * 2  # 28 — "2 * quarter_size, which is smaller"


def _grid_neighbors():
    """4-neighborhood of each of the 9 grid points, in the reference's
    column-major point order (grid_head.py:89-103: i = x_idx*3 + y_idx)."""
    nbrs = []
    for i in range(GRID_SIZE):
        for j in range(GRID_SIZE):
            n = []
            if i > 0:
                n.append((i - 1) * GRID_SIZE + j)
            if j > 0:
                n.append(i * GRID_SIZE + j - 1)
            if j < GRID_SIZE - 1:
                n.append(i * GRID_SIZE + j + 1)
            if i < GRID_SIZE - 1:
                n.append((i + 1) * GRID_SIZE + j)
            nbrs.append(tuple(n))
    return tuple(nbrs)


def _grid_sub_regions():
    """Per-point 28x28 sub-window offsets inside the 56x56 whole map
    (grid_head.py calc_sub_regions)."""
    subs = []
    for i in range(GRID_POINTS):
        def off(idx):
            if idx == 0:
                return 0
            if idx == GRID_SIZE - 1:
                return GRID_HALF
            return max(int((idx / (GRID_SIZE - 1) - 0.25) * GRID_WHOLE), 0)
        subs.append((off(i // GRID_SIZE), off(i % GRID_SIZE)))
    return tuple(subs)


GRID_NEIGHBORS = _grid_neighbors()
GRID_SUBS = _grid_sub_regions()


class GridHead(nn.Module):
    """Exact reference grid head (grid_head.py:11-187): 8 convs (first
    stride 2) with GN(36)+relu to 9x64 point features, first- and
    second-order neighbor fusion (5x5 depthwise + 1x1 transitions), then two
    grouped (groups=9) 4x4/s2 deconvs to 9 half-map (28x28) point heatmaps.
    Training also emits the unfused heatmaps through the SAME deconvs."""

    point_channels: int = 64

    def _trans(self, t, name):
        c = self.point_channels
        t = nn.Conv(c, (5, 5), padding=[(2, 2)] * 2, feature_group_count=c,
                    name=f"{name}_dw")(t)
        return nn.Conv(c, (1, 1), name=f"{name}_pw")(t)

    def _gdeconv_params(self, cin, cout, name, bias_init=0.0):
        w = self.param(f"{name}_w", nn.initializers.normal(0.001),
                       (4, 4, cin // GRID_POINTS, cout))
        b = self.param(f"{name}_b", nn.initializers.constant(bias_init),
                       (cout,))
        return w, b

    @staticmethod
    def _gdeconv(x, wb):
        """Grouped (groups=9) 4x4 stride-2 pad-1 transposed conv
        == conv_general_dilated with lhs_dilation 2 and padding k-1-p = 2."""
        w, b = wb
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=GRID_POINTS)
        return y + b

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        """roi_feats [N, 14, 14, C] -> fused heatmaps [N, 28, 28, 9]
        (+ unfused when ``train``)."""
        c = self.point_channels
        co = c * GRID_POINTS
        x = roi_feats
        for i in range(8):
            x = nn.Conv(co, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=[(1, 1)] * 2, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=36, epsilon=1e-5, name=f"gn{i}")(x)
            x = nn.relu(x)
        # x [N, 7, 7, 576], channel layout = 9 point-major groups of 64

        def pt(t, i):
            return t[..., i * c:(i + 1) * c]

        # first-order fusion: each point += transitions of its neighbors
        x_fo = []
        for i, nbrs in enumerate(GRID_NEIGHBORS):
            acc = pt(x, i)
            for j, p in enumerate(nbrs):
                acc = acc + self._trans(pt(x, p), f"fo{i}_{j}")
            x_fo.append(acc)
        # second-order fusion over the first-order features
        x_so = []
        for i, nbrs in enumerate(GRID_NEIGHBORS):
            acc = pt(x, i)
            for j, p in enumerate(nbrs):
                acc = acc + self._trans(x_fo[p], f"so{i}_{j}")
            x_so.append(acc)

        norm1 = nn.GroupNorm(num_groups=GRID_POINTS, epsilon=1e-5,
                             name="gn_deconv")
        d1 = self._gdeconv_params(co, co, "deconv1")
        # deconv2 bias -log(0.99/0.01) (grid_head.py:149)
        d2 = self._gdeconv_params(co, GRID_POINTS, "deconv2",
                                  bias_init=-float(np.log(99.0)))

        # shared deconv stack applied to fused (and, in training, unfused)
        def run(feat):
            y = nn.relu(norm1(self._gdeconv(feat, d1)))
            return self._gdeconv(y, d2)

        fused = run(jnp.concatenate(x_so, axis=-1))
        if not train:
            return fused
        return fused, run(x)


class GridRCNN(nn.Module):
    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.base = FasterRCNN(cfg=self.cfg, name="base")
        self.grid_head = GridHead(name="grid_head")

    def extract_feat(self, imgs):
        return self.base.extract_feat(imgs)

    def rpn_forward(self, neck):
        return self.base.rpn_forward(neck)

    def roi_feats14(self, neck, rois, binds):
        return roi_align(neck.astype(jnp.float32), rois,
                         spatial_scale=1.0 / self.cfg.stride,
                         batch_inds=binds, out_size=14, sampling_ratio=2)

    def cls_forward(self, roi_feats):
        return self.base.bbox_forward(roi_feats)

    def grid_forward(self, roi_feats14, train: bool = False):
        return self.grid_head(roi_feats14, train)

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        cls, reg = self.rpn_forward(neck)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        binds = jnp.zeros((4,), jnp.int32)
        out = self.cls_forward(self.base.roi_feats(neck, rois, binds))
        grids = self.grid_forward(self.roi_feats14(neck, rois, binds))
        return cls, reg, out, grids


def grid_rcnn_loss(model: GridRCNN, params, batch: DetTrainBatch,
                   rng: jax.Array, anchors):
    """Faster-RCNN cls/rpn losses + border-heatmap CE instead of box reg."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.img[None], method=GridRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=GridRCNN.rpn_forward)
    ls = rpn.rpn_loss([(cls[0], reg[0])], [anchors], batch.gt_boxes,
                      batch.gt_valid, rng_rpn, batch.img_shape)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    tgts = bh.bbox_targets(
        props.boxes, props.valid, batch.gt_boxes, batch.gt_labels,
        batch.gt_valid, rng_roi, num_classes=cfg.num_classes,
        num_samples=cfg.num_roi_samples)
    binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], tgts.rois, binds,
                     method=lambda m, nf, r, b: m.base.roi_feats(nf, r, b))
    cs, bp = model.apply(params, rf, method=GridRCNN.cls_forward)
    roi = bh.bbox_loss(cs, bp, tgts, num_classes=cfg.num_classes)

    # random jitter of the positive proposals (grid_roi_head.py:38-61)
    from ...core.boxes import delta2bbox

    rng_jit = jax.random.fold_in(rng, 7)
    off = jax.random.uniform(rng_jit, (tgts.rois.shape[0], 4),
                             minval=-0.15, maxval=0.15)
    cxcy = (tgts.rois[:, 2:] + tgts.rois[:, :2]) / 2
    wh = jnp.abs(tgts.rois[:, 2:] - tgts.rois[:, :2])
    ncxcy = cxcy + wh * off[:, :2]
    nwh = wh * (1 + off[:, 2:])
    jit = jnp.concatenate([ncxcy - nwh / 2, ncxcy + nwh / 2], axis=-1)
    lim = jnp.asarray([batch.img_shape[1] - 1, batch.img_shape[0] - 1] * 2,
                      jnp.float32)
    jit = jnp.clip(jit, 0.0, lim)
    grid_rois = jnp.where(tgts.is_pos[:, None], jit, tgts.rois)

    rf14 = model.apply(params, neck[0], grid_rois, binds,
                       method=GridRCNN.roi_feats14)
    fused, unfused = model.apply(params, rf14, True,
                                 method=GridRCNN.grid_forward)
    # matched gt boxes, recovered by decoding the stored regression targets
    # against the UNjittered rois (the gt is jitter-invariant)
    dec = delta2bbox(tgts.rois, tgts.bbox_targets, stds=bh.BBOX_STDS)
    targets = grid_targets(grid_rois, dec)
    w = tgts.is_pos.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0) * GRID_POINTS * GRID_HALF * GRID_HALF

    def bce(hm):
        p = hm.astype(jnp.float32)
        ce = (jnp.maximum(p, 0) - p * targets
              + jnp.log1p(jnp.exp(-jnp.abs(p))))
        return jnp.sum(ce * w[:, None, None, None]) / denom

    # CrossEntropyLoss(use_sigmoid=True, loss_weight=15) on BOTH heatmap
    # sets (grid_head.py:289-293)
    loss_grid = 15.0 * (bce(fused) + bce(unfused))

    total = ls.loss_cls + ls.loss_bbox + roi.loss_cls + loss_grid
    return total, {"loss": total, "loss_cls": roi.loss_cls,
                   "loss_grid": loss_grid}


def grid_targets(pos_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                 pos_radius: int = 1) -> jnp.ndarray:
    """Exact grid_head.get_targets (grid_head.py:221-284): rois expanded
    2x, each of the 9 gt grid points rendered as a radius-``pos_radius``
    circle on the 56x56 whole map (int-truncated center), then each point's
    28x28 sub-region cropped out. pos_boxes/gt_boxes [N, 4] ->
    [N, 28, 28, 9] (NHWC, point-last)."""
    ex1 = pos_boxes[:, 0] - (pos_boxes[:, 2] - pos_boxes[:, 0]) / 2
    ey1 = pos_boxes[:, 1] - (pos_boxes[:, 3] - pos_boxes[:, 1]) / 2
    ex2 = pos_boxes[:, 2] + (pos_boxes[:, 2] - pos_boxes[:, 0]) / 2
    ey2 = pos_boxes[:, 3] + (pos_boxes[:, 3] - pos_boxes[:, 1]) / 2
    ws = ex2 - ex1
    hs = ey2 - ey1

    fx = jnp.asarray([1 - (i // GRID_SIZE) / (GRID_SIZE - 1)
                      for i in range(GRID_POINTS)], jnp.float32)
    fy = jnp.asarray([1 - (i % GRID_SIZE) / (GRID_SIZE - 1)
                      for i in range(GRID_POINTS)], jnp.float32)
    gx = fx[None] * gt_boxes[:, 0:1] + (1 - fx)[None] * gt_boxes[:, 2:3]
    gy = fy[None] * gt_boxes[:, 1:2] + (1 - fy)[None] * gt_boxes[:, 3:4]
    # int() truncation toward zero, as torch (grid_head.py:263-266)
    cx = ((gx - ex1[:, None]) / jnp.maximum(ws, 1e-6)[:, None]
          * GRID_WHOLE).astype(jnp.int32)
    cy = ((gy - ey1[:, None]) / jnp.maximum(hs, 1e-6)[:, None]
          * GRID_WHOLE).astype(jnp.int32)

    subx = jnp.asarray([s[0] for s in GRID_SUBS], jnp.int32)
    suby = jnp.asarray([s[1] for s in GRID_SUBS], jnp.int32)
    xs = jnp.arange(GRID_HALF, dtype=jnp.int32)[None, :] + subx[:, None]
    ys = jnp.arange(GRID_HALF, dtype=jnp.int32)[None, :] + suby[:, None]
    d2 = ((xs[None, :, None, :] - cx[:, :, None, None]) ** 2
          + (ys[None, :, :, None] - cy[:, :, None, None]) ** 2)
    tgt = (d2 <= pos_radius * pos_radius)
    # ignore small bboxes: expanded w/h <= grid_size (grid_head.py:255-257)
    ok = (ws > GRID_SIZE) & (hs > GRID_SIZE)
    tgt = tgt & ok[:, None, None, None]
    return jnp.transpose(tgt, (0, 2, 3, 1)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Inference paths (round-3: every registered family CLI-runnable —
# reference simple_test of each detector)
# ---------------------------------------------------------------------------


def _sub_params(params, name):
    """Nested-module facade: slice the child's param subtree."""
    return {c: t[name] for c, t in params.items() if name in t}


def mask_scoring_detect(model: MaskScoringRCNN, params, img, img_shape,
                        anchors, scale_factor=None):
    """mask_scoring_rcnn.py simple_test: Mask R-CNN detect, then the MaskIoU
    head rescales each detection's score by its predicted mask IoU (the
    reference applies this to the mask score ranking)."""
    from .mask_rcnn import mask_rcnn_detect

    cfg = model.cfg
    sub = _sub_params(params, "mask_rcnn")
    dets, masks = mask_rcnn_detect(MaskRCNN(cfg=cfg), sub, img, img_shape,
                                   anchors, scale_factor=scale_factor)
    _, neck = model.apply(
        params, img[None], method=lambda m, x: m.mask_rcnn.extract_feat(x))
    binds = jnp.zeros((dets.boxes.shape[0],), jnp.int32)
    _, _, miou = model.apply(params, neck[0], dets.boxes, binds,
                             method=MaskScoringRCNN.mask_branch)
    cls_idx = jnp.clip(dets.labels, 0, cfg.num_classes - 1)
    iou_c = jnp.take_along_axis(miou, cls_idx[:, None], axis=1)[:, 0]
    scores = dets.scores * jnp.clip(iou_c, 0.0, 1.0)
    return nms_ops.DetResult(dets.boxes, scores, dets.labels, dets.valid), masks


def point_rend_detect(model: PointRendRCNN, params, img, img_shape, anchors,
                      scale_factor=None):
    """point_rend.py simple_test: Mask R-CNN boxes, masks refined at the
    most-uncertain points by the point head."""
    from .mask_rcnn import mask_rcnn_detect

    cfg = model.cfg
    sub = _sub_params(params, "mask_rcnn")
    dets, _ = mask_rcnn_detect(MaskRCNN(cfg=cfg), sub, img, img_shape,
                               anchors, scale_factor=scale_factor)
    _, neck = model.apply(
        params, img[None], method=lambda m, x: m.mask_rcnn.extract_feat(x))
    binds = jnp.zeros((dets.boxes.shape[0],), jnp.int32)
    refined, _ = model.apply(params, neck[0], dets.boxes, binds, dets.labels,
                             method=PointRendRCNN.mask_with_points)
    cls_idx = jnp.clip(dets.labels, 0, cfg.num_classes - 1)
    probs = jax.nn.sigmoid(jnp.take_along_axis(
        refined, cls_idx[:, None, None, None], axis=-1)[..., 0])
    masks = paste_masks(probs, dets.boxes, cfg.pad_h, cfg.pad_w)
    return dets, masks


def grid_points_decode(heatmaps: jnp.ndarray, boxes: jnp.ndarray,
                       img_shape) -> jnp.ndarray:
    """Exact grid_head.get_bboxes (grid_head.py:295-359): per-point argmax
    over its 28x28 sub-heatmap, positions lifted into the 56x56 whole map
    (sub-region offsets), mapped to absolute coordinates in the 2x-expanded
    roi frame, then each border is the confidence-weighted vote of its 3
    boundary grid points. heatmaps [N, 28, 28, 9] logits, boxes [N, 4]."""
    n, hh, ww, gp = heatmaps.shape
    probs = jax.nn.sigmoid(heatmaps.astype(jnp.float32))
    flat = jnp.transpose(probs, (0, 3, 1, 2)).reshape(n, gp, hh * ww)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.max(flat, axis=-1)  # [N, 9]
    subx = jnp.asarray([s[0] for s in GRID_SUBS], jnp.float32)
    suby = jnp.asarray([s[1] for s in GRID_SUBS], jnp.float32)
    xs = (idx % ww).astype(jnp.float32) + subx[None]
    ys = (idx // ww).astype(jnp.float32) + suby[None]

    widths = (boxes[:, 2] - boxes[:, 0])[:, None]
    heights = (boxes[:, 3] - boxes[:, 1])[:, None]
    x1e = boxes[:, 0:1] - widths / 2
    y1e = boxes[:, 1:2] - heights / 2
    abs_x = (xs + 0.5) / ww * widths + x1e
    abs_y = (ys + 0.5) / hh * heights + y1e

    # boundary point index sets (column-major order: i = x_idx*3 + y_idx)
    x1i, y1i = jnp.asarray([0, 1, 2]), jnp.asarray([0, 3, 6])
    x2i, y2i = jnp.asarray([6, 7, 8]), jnp.asarray([2, 5, 8])

    def vote(vals, inds):
        s = scores[:, inds]
        return jnp.sum(vals[:, inds] * s, -1) / jnp.maximum(
            jnp.sum(s, -1), 1e-6)

    bx1, by1 = vote(abs_x, x1i), vote(abs_y, y1i)
    bx2, by2 = vote(abs_x, x2i), vote(abs_y, y2i)
    out = jnp.stack([bx1, by1, bx2, by2], axis=-1)
    lim = jnp.asarray([img_shape[1], img_shape[0]] * 2, jnp.float32)
    return jnp.clip(out, 0.0, lim)


def grid_rcnn_detect(model: GridRCNN, params, img, img_shape, anchors,
                     scale_factor=None):
    """grid_roi_head.py simple_test: bbox head scores the proposals WITHOUT
    regression (grid_rcnn config with_reg=False) and multiclass NMS picks
    the detections FIRST; the grid head then re-localizes those det boxes
    via the 9-point heatmaps (get_bboxes), and rescale happens last."""
    cfg = model.cfg
    _, neck = model.apply(params, img[None], method=GridRCNN.extract_feat)
    cls, reg = model.apply(params, neck, method=GridRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    binds = jnp.zeros((props.boxes.shape[0],), jnp.int32)
    rf = model.apply(params, neck[0], props.boxes, binds,
                     method=lambda m, nf, r, b: m.base.roi_feats(nf, r, b))
    cls_score, _ = model.apply(params, rf, method=GridRCNN.cls_forward)
    scores = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)

    dets = nms_ops.multiclass_nms(props.boxes, scores, score_thr=1e-4,
                                  iou_threshold=0.5, max_num=100,
                                  box_valid=props.valid)
    dbinds = jnp.zeros((dets.boxes.shape[0],), jnp.int32)
    rf14 = model.apply(params, neck[0], dets.boxes, dbinds,
                       method=GridRCNN.roi_feats14)
    grids = model.apply(params, rf14, method=GridRCNN.grid_forward)
    boxes = grid_points_decode(grids, dets.boxes, img_shape)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    return dets._replace(boxes=boxes)


def trident_detect(model: TridentFasterRCNN, params, img, img_shape, anchors,
                   scale_factor=None):
    """trident_faster_rcnn.py simple_test: inference uses the MIDDLE scale
    branch only (branch index 1 of 3)."""
    cfg = model.cfg
    neck = model.apply(params, img[None],
                       method=TridentFasterRCNN.extract_feat)
    mid = neck.shape[0] // 2
    nf = neck[mid:mid + 1]
    cls, reg = model.apply(params, nf, method=TridentFasterRCNN.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    rf = model.apply(params, nf[0], props.boxes,
                     jnp.zeros((props.boxes.shape[0],), jnp.int32),
                     method=TridentFasterRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf,
                                       method=TridentFasterRCNN.bbox_forward)
    return bh.bbox_decode(props.boxes, cls_score, bbox_pred, img_shape,
                          roi_valid=props.valid, scale_factor=scale_factor)
