"""Guided Anchoring (GA-Retina/GA-RPN).

Parity target: GuidedAnchorHead / GARetinaHead (mmdetection/mmdet/models/
dense_heads/guided_anchor_head.py:1-860, ga_retina_head.py:1-109): a
LOCATION branch (anchor-presence objectness; focal loss on center-region
targets), a SHAPE branch (per-cell (dw, dh) in log space; bounded-IoU loss
against the best-overlapping gt), a DeformConv FEATURE ADAPTATION driven by
the shape prediction, then the usual cls/reg heads on adapted features with
the PREDICTED ("guided") square-base anchors. (Cascade RPN lives in
cascade_rpn_head.py.)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ...core import boxes as box_ops, losses, nms as nms_ops
from ...core.anchors import AnchorGenerator
from ...ops.deform_conv import deform_conv
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

GA_STRIDES = (8, 16, 32, 64, 128)
# ga_retinanet config (mmdetection/configs/guided_anchoring/
# ga_retinanet_r50_caffe_fpn_1x_coco.py): approx generator octave_base_scale=4,
# scales_per_octave=3, ratios [.5, 1, 2]; square generator scales=[4],
# ratios=[1]; train_cfg center_ratio=.2, ignore_ratio=.5; ga_assigner
# ApproxMaxIoU (.5/.4/.4); cls/reg assigner MaxIoU (.5/.5/0).
GA_OCTAVE_BASE_SCALE = 4
GA_SCALES_PER_OCTAVE = 3
GA_RATIOS = (0.5, 1.0, 2.0)
GA_SQUARE_SCALE = 4.0


class AdaptiveDCN(nn.Module):
    """3x3 DeformConv with supplied offsets."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x, offset):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return jax.vmap(lambda xi, oi: deform_conv(xi, oi, w, b))(x, offset)


def shape_to_offsets(dwdh, stride):
    """Map predicted (dw, dh) anchor shapes to 3x3 DCN offsets so the taps
    cover the anchor extent (guided_anchor feature adaption: offsets from a
    1x1 conv on the shape pred — here the analytic version)."""
    w = jnp.exp(dwdh[..., 0]) * GA_SQUARE_SCALE  # square base, stride units
    h = jnp.exp(dwdh[..., 1]) * GA_SQUARE_SCALE
    chans = []
    for dy in (-1.0, 0.0, 1.0):
        for dx in (-1.0, 0.0, 1.0):
            chans.append(dy * (h / 3.0 - 1.0))
            chans.append(dx * (w / 3.0 - 1.0))
    return jnp.stack(chans, axis=-1)


class GARetinaHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs = {b: [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f"{b}_conv{i}")
                     for i in range(self.stacked_convs)]
                 for b in ("cls", "reg")}
        loc_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="conv_loc")
        shape_out = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape")
        adapt_cls = AdaptiveDCN(self.feat_channels, name="feature_adaption_cls")
        adapt_reg = AdaptiveDCN(self.feat_channels, name="feature_adaption_reg")
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="retina_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name="retina_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            loc = loc_out(c).astype(jnp.float32)
            shape = shape_out(r).astype(jnp.float32)
            off = shape_to_offsets(jax.lax.stop_gradient(shape), 1)
            c_a = nn.relu(adapt_cls(c.astype(jnp.float32), off))
            r_a = nn.relu(adapt_reg(r.astype(jnp.float32), off))
            outs.append((cls_out(c_a.astype(self.dtype)),
                         reg_out(r_a.astype(self.dtype)), shape, loc))
        return tuple(outs)


def guided_anchors(shape_pred, stride, h, w, scale: float = GA_SQUARE_SCALE):
    """Per-cell guided anchor from the predicted (dw, dh): the square base
    anchor (scale 4, centered on the mmdet grid point ``x * stride`` —
    AnchorGenerator center_offset=0) decoded with deltas (0, 0, dw, dh) and
    target_stds (1, 1, 1, 1), i.e. w = s·exp(dw)
    (guided_anchor_head.py get_anchors → anchor_coder.decode)."""
    cy = jnp.arange(h, dtype=jnp.float32)[:, None] * stride
    cx = jnp.arange(w, dtype=jnp.float32)[None, :] * stride
    aw = jnp.exp(shape_pred[..., 0]) * scale * stride
    ah = jnp.exp(shape_pred[..., 1]) * scale * stride
    a = jnp.stack([
        jnp.broadcast_to(cx, (h, w)) - aw / 2,
        jnp.broadcast_to(cy, (h, w)) - ah / 2,
        jnp.broadcast_to(cx, (h, w)) + aw / 2,
        jnp.broadcast_to(cy, (h, w)) + ah / 2,
    ], axis=-1)
    return a.reshape(-1, 4)


def _calc_region(gb, ratio, h, w):
    """mmdet calc_region (mmdet/core/anchor/utils.py:49-71): proportional
    center region of boxes ``gb`` [G, 4] (feature-cell units), coords rounded
    half-to-even (torch.round) and clamped to [0, size]."""
    x1 = jnp.clip(jnp.round((1 - ratio) * gb[:, 0] + ratio * gb[:, 2]), 0, w)
    y1 = jnp.clip(jnp.round((1 - ratio) * gb[:, 1] + ratio * gb[:, 3]), 0, h)
    x2 = jnp.clip(jnp.round(ratio * gb[:, 0] + (1 - ratio) * gb[:, 2]), 0, w)
    y2 = jnp.clip(jnp.round(ratio * gb[:, 1] + (1 - ratio) * gb[:, 3]), 0, h)
    return x1, y1, x2, y2


def ga_loc_targets(gt_boxes, gt_valid, featmap_sizes,
                   strides=GA_STRIDES,
                   octave_base_scale: int = GA_OCTAVE_BASE_SCALE,
                   center_ratio: float = 0.2, ignore_ratio: float = 0.5):
    """Exact ``ga_loc_targets`` (guided_anchor_head.py:376-476), static-shape.

    Per level: positives (target 1, weight 1) in each gt's center region at
    its matched scale level; weight-0 ignore ring (ratio r2) around it, plus
    ignore regions projected onto the adjacent (lvl±1) levels; remaining
    cells are negatives with weight 0.1. The reference writes gts
    sequentially (a later gt's ignore ring can zero an earlier gt's center
    weight) — replicated with a fori_loop in gt order. Returns
    ([(target [h, w], weight [h, w])...], loc_avg_factor = total_cells/200).
    """
    G = gt_boxes.shape[0]
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(jnp.maximum(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]),
        1e-12))
    min_anchor_size = float(octave_base_scale * strides[0])
    lvl_of_gt = jnp.clip(
        jnp.floor(jnp.log2(scale) - np.log2(min_anchor_size) + 0.5),
        0, len(featmap_sizes) - 1).astype(jnp.int32)

    out = []
    for li, (h, w) in enumerate(featmap_sizes):
        stride = float(strides[li])
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        gb = gt_boxes / stride

        def region_masks(ratio, live):
            x1, y1, x2, y2 = _calc_region(gb, ratio, h, w)
            m = ((xs >= x1[:, None, None]) & (xs <= x2[:, None, None])
                 & (ys >= y1[:, None, None]) & (ys <= y2[:, None, None]))
            return m & live[:, None, None]

        on = gt_valid & (lvl_of_gt == li)
        m_ign = region_masks(r2, on)  # [G, h, w]
        m_ctr = region_masks(r1, on)
        adj = gt_valid & ((lvl_of_gt == li - 1) | (lvl_of_gt == li + 1))
        ignore_map = jnp.any(region_masks(r2, adj), axis=0)

        def body(g, wgt):
            wgt = jnp.where(m_ign[g], 0.0, wgt)
            return jnp.where(m_ctr[g], 1.0, wgt)

        wgt = jax.lax.fori_loop(0, G, body, jnp.full((h, w), -1.0))
        tgt = jnp.any(m_ctr, axis=0).astype(jnp.float32)
        wgt = jnp.where((wgt < 0) & ignore_map, 0.0, wgt)
        wgt = jnp.where(wgt < 0, 0.1, wgt)
        out.append((tgt, wgt))
    avg = sum(float(h * w) for h, w in featmap_sizes) / 200.0
    return out, avg


def ga_approx_overlaps(gt_boxes, featmap_sizes, strides=GA_STRIDES):
    """ApproxMaxIoU overlap collapse (approx_max_iou_assigner.py:121-125):
    IoU of every octave approx anchor (octave_base_scale=4,
    scales_per_octave=3, ratios [.5, 1, 2] — 9 per cell) against each gt,
    maxed over the octave → [G, num_squares]."""
    gen = AnchorGenerator(strides=tuple(strides), ratios=GA_RATIOS,
                          octave_base_scale=GA_OCTAVE_BASE_SCALE,
                          scales_per_octave=GA_SCALES_PER_OCTAVE)
    approxs = jnp.asarray(
        np.concatenate(gen.grid_anchors(featmap_sizes)))  # [A*9, 4]
    per_octave = gen.num_base_anchors
    ov = box_ops.bbox_overlaps(gt_boxes, approxs)  # [G, A*9]
    return jnp.max(ov.reshape(gt_boxes.shape[0], -1, per_octave), axis=-1)


def ga_squares(featmap_sizes, strides=GA_STRIDES) -> np.ndarray:
    """The square anchor set (scales=[4], ratios=[1]) as one [A, 4] const."""
    gen = AnchorGenerator(strides=tuple(strides), ratios=(1.0,),
                          scales=(GA_SQUARE_SCALE,))
    return np.concatenate(gen.grid_anchors(featmap_sizes))


def ga_shape_assign(gt_boxes, gt_labels, gt_valid, featmap_sizes,
                    strides=GA_STRIDES):
    """ApproxMaxIoUAssigner semantics: collapse overlaps over each square's
    octave approxs, then MaxIoU-assign the squares with the ga_assigner
    thresholds (pos .5 / neg .4 / min_pos .4)."""
    from ...core import assigners

    overlaps = ga_approx_overlaps(gt_boxes, featmap_sizes, strides)
    return assigners.max_iou_assign(
        None, gt_boxes, gt_labels, gt_valid,
        pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.4,
        overlaps=overlaps)


class GALossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_shape: jnp.ndarray
    loss_loc: jnp.ndarray


def ga_retina_loss(level_outs, gt_boxes, gt_labels, gt_valid, img_shape,
                   num_classes, center_ratio: float = 0.2,
                   ignore_ratio: float = 0.5) -> GALossOut:
    """GA-RetinaNet loss (guided_anchor_head.py loss :640-744 +
    ga_retina config):

    - loc: sigmoid focal (α=.25, γ=2) vs ``ga_loc_targets``'s
      1/0-weighted/0.1-negative cell map, every level averaged by the shared
      ``loc_avg_factor`` (total cells / 200);
    - shape: BoundedIoU (β=.2) between the guided anchors decoded from the
      shape branch and the gt matched by ApproxMaxIoU (.5/.4/.4), averaged by
      the positive count (the reference additionally random-subsamples 256
      squares — deterministic all-positives here, same normalization target);
    - cls/reg: focal + SmoothL1 (β=.04) on the guided anchors with the
      cascade assigner (.5/.5/0), avg by num_pos (FocalLoss → sampling=False).
    """
    from ...core import assigners

    featmap_sizes = [(c.shape[-3], c.shape[-2]) for c, _, _, _ in level_outs]

    # --- loc branch ---
    loc_pairs, loc_avg = ga_loc_targets(
        gt_boxes, gt_valid, featmap_sizes,
        center_ratio=center_ratio, ignore_ratio=ignore_ratio)
    loss_loc = 0.0
    for (tgt, wgt), (_, _, _, loc) in zip(loc_pairs, level_outs):
        p = jax.nn.sigmoid(loc.reshape(tgt.shape).astype(jnp.float32))
        pt = jnp.where(tgt > 0, p, 1 - p)
        alpha_t = jnp.where(tgt > 0, 0.25, 0.75)
        fl = alpha_t * (1 - pt) ** 2 * (-jnp.log(jnp.clip(pt, 1e-8)))
        loss_loc = loss_loc + jnp.sum(fl * wgt) / loc_avg

    # --- shape branch ---
    squares = jnp.asarray(ga_squares(featmap_sizes))  # [A, 4]
    shape_all = jnp.concatenate(
        [s.reshape(-1, 2).astype(jnp.float32) for _, _, s, _ in level_outs])
    sh_assign = ga_shape_assign(gt_boxes, gt_labels, gt_valid, featmap_sizes)
    sh_pos = sh_assign.assigned_gt_inds > 0
    sh_matched = gt_boxes[jnp.clip(sh_assign.assigned_gt_inds - 1, 0,
                                   gt_boxes.shape[0] - 1)]
    scx = (squares[:, 0] + squares[:, 2]) * 0.5
    scy = (squares[:, 1] + squares[:, 3]) * 0.5
    sw = squares[:, 2] - squares[:, 0]
    sh = squares[:, 3] - squares[:, 1]
    pw = sw * jnp.exp(shape_all[:, 0])
    ph = sh * jnp.exp(shape_all[:, 1])
    pred_anchors = jnp.stack(
        [scx - pw / 2, scy - ph / 2, scx + pw / 2, scy + ph / 2], axis=-1)
    sh_num_pos = jnp.maximum(jnp.sum(sh_pos), 1.0)
    loss_shape = losses.bounded_iou_loss(
        pred_anchors, sh_matched, beta=0.2,
        weight=sh_pos.astype(jnp.float32), avg_factor=sh_num_pos)

    # --- cls/reg on the guided anchors ---
    all_cls, all_reg, all_anchors = [], [], []
    for li, (cls, reg, shape, _) in enumerate(level_outs):
        h, w = featmap_sizes[li]
        anc = guided_anchors(shape.reshape(h, w, 2), GA_STRIDES[li], h, w)
        all_cls.append(cls.reshape(-1, num_classes).astype(jnp.float32))
        all_reg.append(reg.reshape(-1, 4).astype(jnp.float32))
        all_anchors.append(jax.lax.stop_gradient(anc))
    cls_all = jnp.concatenate(all_cls)
    reg_all = jnp.concatenate(all_reg)
    anchors = jnp.concatenate(all_anchors)
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid, 0.5, 0.5, min_pos_iou=0.0)
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    onehot = jax.nn.one_hot(jnp.clip(assign.labels, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    wvec = (pos | neg).astype(jnp.float32)[:, None]
    loss_cls = losses.sigmoid_focal_loss(cls_all, onehot, weight=wvec,
                                         avg_factor=num_pos)
    matched = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                gt_boxes.shape[0] - 1)]
    tgt = box_ops.bbox2delta(anchors, matched)
    loss_bbox = losses.smooth_l1_loss(
        reg_all, tgt, beta=0.04, weight=pos[:, None].astype(jnp.float32),
        avg_factor=num_pos)
    return GALossOut(loss_cls, loss_bbox, loss_shape, loss_loc)


def ga_retina_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                     score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                     loc_thr: float = 0.01, scale_factor=None
                     ) -> nms_ops.DetResult:
    all_b, all_s, all_l = [], [], []
    for li, (cls, reg, shape, loc) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        anc = guided_anchors(shape.reshape(h, w, 2), GA_STRIDES[li], h, w)
        keep = jax.nn.sigmoid(loc.reshape(-1)) >= loc_thr  # anchor presence
        scores = jax.nn.sigmoid(
            cls.reshape(-1, num_classes).astype(jnp.float32)
        ) * keep[:, None]
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        bi = top_i // num_classes
        decoded = box_ops.delta2bbox(anc[bi], deltas[bi], max_shape=img_shape)
        all_b.append(decoded)
        all_s.append(top_s)
        all_l.append((top_i % num_classes).astype(jnp.int32))
    boxes = jnp.concatenate(all_b)
    scores = jnp.concatenate(all_s)
    labels = jnp.concatenate(all_l)
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    res = nms_ops.batched_nms(boxes, scores, labels, iou_threshold,
                              max_per_img, valid=scores > score_thr)
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds],
                             res.valid)


class GARetinaNet(nn.Module):
    """Full guided-anchoring RetinaNet: ResNet + FPN + GARetinaHead
    (reference mmdetection/configs/guided_anchoring/ga_retinanet_r50_fpn —
    the registered head-only module becomes CLI-runnable through this
    assembly; round-3 family dispatch)."""

    num_classes: int = 80
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(
            depth=self.depth, out_indices=(1, 2, 3), frozen_stages=1,
            dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_input", dtype=self.dtype,
                        name="neck")
        self.head = GARetinaHead(num_classes=self.num_classes,
                                 dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.head(self.neck(self.backbone(imgs)))
