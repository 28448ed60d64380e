"""FPN-trunk Faster R-CNN variants: GA-RPN, GRoIE and Libra R-CNN.

Parity targets:
- The FPN two-stage trunk itself (mmdetection/configs/_base_/models/
  faster_rcnn_r50_fpn.py): ResNet C2-C5 -> FPN(256, 5 outs), per-level RPN
  (anchor scale 8, ratios .5/1/2, strides 4/8/16/32/64), RoIAlign levels
  P2-P5 with the scale-based level dispatch
  (roi_extractors/single_level_roi_extractor.py map_roi_levels,
  finest_scale=56).
- ``GARPNHead`` (mmdet/models/dense_heads/ga_rpn_head.py:1): a 3x3 rpn
  conv + the GuidedAnchorHead branches (loc objectness via focal loss,
  (dw, dh) shape via BoundedIoU, DeformConv feature adaption, then binary
  cls + reg on the guided anchors); proposals are per-level NMS of the
  loc-masked guided anchors (config ga_rpn_r50_fpn_1x_coco.py:
  octave_base_scale 8, squares scale 8, anchor stds (.07,.07,.14,.14),
  bbox stds (.07,.07,.11,.11), ga_assigner .7/.3/.3).
- ``GenericRoIExtractor`` / GRoIE (roi_extractors/
  generic_roi_extractor.py:1 + configs/groie/): RoIAlign from EVERY level,
  each pre-processed by a 5x5 ConvModule, summed, then refined by a
  GeneralizedAttention block ('0100', 6 heads, kv_stride 2).
- Libra R-CNN (configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py):
  FPN + BFP(non_local refine) neck, IoU-balanced negative sampling +
  instance-balanced positive sampling, BalancedL1 roi regression.

TPU-first: all levels are processed with static shapes; the per-roi level
dispatch computes RoIAlign on every level and selects by mask (the gathers
stay regular); GRoIE simply sums the per-level results — no scatter.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import assigners, boxes as box_ops, losses, nms as nms_ops
from ...core.anchors import AnchorGenerator
from ...ops.roi_align import roi_align
from ..backbones.resnet import ResNet
from ..dense_heads import rpn_head as rpn
from ..dense_heads.guided_anchor_head import (
    AdaptiveDCN, _calc_region, ga_loc_targets, guided_anchors,
    shape_to_offsets,
)
from ..necks.extra_necks import BFP, NonLocal2d  # noqa: F401 — Libra refine
from ..necks.fpn import FPN
from ..roi_heads import bbox_head as bh

FPN_STRIDES = (4, 8, 16, 32, 64)
FPN_RPN_SCALE = 8.0
FPN_FINEST_SCALE = 56.0

# ga_rpn config constants
GA_RPN_OCTAVE = 8
GA_RPN_SQUARE = 8.0
GA_RPN_ANCHOR_STDS = (0.07, 0.07, 0.14, 0.14)
GA_RPN_BBOX_STDS = (0.07, 0.07, 0.11, 0.11)


def fpn_anchor_gen() -> AnchorGenerator:
    """Per-level single-scale RPN anchors (faster_rcnn_r50_fpn config)."""
    return AnchorGenerator(strides=FPN_STRIDES, ratios=(0.5, 1.0, 2.0),
                           scales=(FPN_RPN_SCALE,))


def make_fpn_anchors(pad_h: int, pad_w: int):
    gen = fpn_anchor_gen()
    sizes = [(int(np.ceil(pad_h / s)), int(np.ceil(pad_w / s)))
             for s in FPN_STRIDES]
    return [jnp.asarray(a) for a in gen.grid_anchors(sizes)]


def map_roi_levels(rois: jnp.ndarray, num_levels: int,
                   finest_scale: float = FPN_FINEST_SCALE) -> jnp.ndarray:
    """single_level_roi_extractor.py:32-53 map_roi_levels:
    level = floor(log2(sqrt(area) / finest_scale + 1e-6)) clamped."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(level_feats: Sequence[jnp.ndarray],
                         rois: jnp.ndarray, out_size: int = 7,
                         num_roi_levels: int = 4) -> jnp.ndarray:
    """SingleRoIExtractor semantics over FPN levels: each roi is pooled from
    the level its scale maps to. Static shapes: pool on every level, select
    by mask. level_feats: per-level [H, W, C] (P2..)."""
    lvl = map_roi_levels(rois, num_roi_levels)
    binds = jnp.zeros((rois.shape[0],), jnp.int32)
    pooled = []
    for i in range(num_roi_levels):
        f = level_feats[i]
        pooled.append(roi_align(
            f.astype(jnp.float32)[None], rois,
            spatial_scale=1.0 / FPN_STRIDES[i], batch_inds=binds,
            out_size=out_size, sampling_ratio=2))
    stacked = jnp.stack(pooled)  # [L, N, s, s, C]
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0)[0]


# ---------------------------------------------------------------------------
# GeneralizedAttention + GenericRoIExtractor (GRoIE)
# ---------------------------------------------------------------------------


class GeneralizedAttention(nn.Module):
    """The mmcv GeneralizedAttention brick (groie post_cfg: num_heads=6,
    attention_type='0100', kv_stride=2, spatial_range=-1).

    attention_type is a 4-bit mask over the empirical-attention terms
    (An Empirical Study of Spatial Attention Mechanisms, arXiv:1904.05873):
    bit0 query-content x key-content, bit1 query-content x relative
    position, bit2 key-content bias, bit3 relative-position bias. The
    groie config uses '0100' — attention driven by the query content and a
    learned projection of the sinusoidal relative-position embedding, with
    the x/y terms computed separably and summed, exactly the structure of
    the mmcv kernel. Output is a residual 1x1 projection of the attended
    values.
    """

    num_heads: int = 6
    attention_type: str = "0100"
    kv_stride: int = 2
    position_embedding_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, C] -> [N, H, W, C] (residual)."""
        n, h, w, c = x.shape
        heads = self.num_heads
        # mmcv: qk_embed_dim = in_channels // num_heads; the projections
        # output qk_embed_dim * num_heads (not necessarily c)
        dk = c // heads
        qk_c = dk * heads
        use_q = self.attention_type[0] == "1" or self.attention_type[1] == "1"
        kh, kw = (h + self.kv_stride - 1) // self.kv_stride, \
            (w + self.kv_stride - 1) // self.kv_stride
        xkv = x[:, ::self.kv_stride, ::self.kv_stride, :]

        logits = jnp.zeros((n, heads, h * w, kh * kw), jnp.float32)
        if use_q:
            q = nn.Conv(qk_c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="query_conv")(x)
            q = q.reshape(n, h * w, heads, dk).transpose(0, 2, 1, 3)
        if self.attention_type[0] == "1":  # content-content
            k = nn.Conv(qk_c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="key_conv")(xkv)
            k = k.reshape(n, kh * kw, heads, dk).transpose(0, 2, 1, 3)
            logits = logits + jnp.einsum(
                "nhqd,nhkd->nhqk", q.astype(jnp.float32),
                k.astype(jnp.float32)) / jnp.sqrt(float(dk))
        if self.attention_type[1] == "1":  # content-position (separable x/y)
            # sinusoidal embedding of relative offsets, projected per head
            def pos_embed(rel):  # [R] -> [R, D]
                d = self.position_embedding_dim // 2
                freq = jnp.exp(jnp.arange(d) * (-np.log(10000.0) / max(d - 1, 1)))
                ang = rel[:, None] * freq[None, :]
                return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)

            rel_x = (jnp.arange(w)[:, None]
                     - jnp.arange(0, w, self.kv_stride)[None, :]).reshape(-1)
            rel_y = (jnp.arange(h)[:, None]
                     - jnp.arange(0, h, self.kv_stride)[None, :]).reshape(-1)
            ex = nn.Dense(dk * heads, use_bias=False, dtype=self.dtype,
                          name="appr_geom_fc_x")(
                pos_embed(rel_x.astype(jnp.float32)))
            ey = nn.Dense(dk * heads, use_bias=False, dtype=self.dtype,
                          name="appr_geom_fc_y")(
                pos_embed(rel_y.astype(jnp.float32)))
            ex = ex.reshape(w, kw, heads, dk).astype(jnp.float32)
            ey = ey.reshape(h, kh, heads, dk).astype(jnp.float32)
            qg = q.reshape(n, heads, h, w, dk).astype(jnp.float32)
            # separable logits: query content vs x-embedding and vs
            # y-embedding (per head), broadcast-summed to the full key grid
            lx = jnp.einsum("nhywd,wvhd->nhywv", qg, ex)  # [n,hd,h,w,kw]
            ly = jnp.einsum("nhywd,yuhd->nhywu", qg, ey)  # [n,hd,h,w,kh]
            grid = (lx[:, :, :, :, None, :]
                    + ly[:, :, :, :, :, None]).reshape(
                n, heads, h * w, kh * kw)
            logits = logits + grid / jnp.sqrt(float(dk))
        if self.attention_type[2] == "1":  # key-content bias
            kb = nn.Conv(heads, (1, 1), dtype=self.dtype,
                         name="key_bias_conv")(xkv)
            logits = logits + kb.reshape(n, kh * kw, heads
                                         ).transpose(0, 2, 1)[:, :, None, :]
        if self.attention_type[3] == "1":  # position bias
            pb = self.param("pos_bias", nn.initializers.zeros,
                            (heads, kh * kw))
            logits = logits + pb[None, :, None, :]

        attn = jax.nn.softmax(logits, axis=-1)
        v = nn.Conv(qk_c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="value_conv")(xkv)
        v = v.reshape(n, kh * kw, heads, dk).transpose(0, 2, 1, 3)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v.astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(n, h, w, qk_c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_conv")(
            out.astype(self.dtype))
        return x + out.astype(x.dtype)


class GenericRoIExtractor(nn.Module):
    """GRoIE (generic_roi_extractor.py:1): pool from ALL levels, 5x5
    ConvModule pre-processing per level, sum, GeneralizedAttention post."""

    out_channels: int = 256
    num_levels: int = 4
    out_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, level_feats: Sequence[jnp.ndarray],
                 rois: jnp.ndarray) -> jnp.ndarray:
        binds = jnp.zeros((rois.shape[0],), jnp.int32)
        acc = None
        pre = nn.Conv(self.out_channels, (5, 5), padding=[(2, 2)] * 2,
                      dtype=self.dtype, name="pre_module")
        for i in range(self.num_levels):
            rf = roi_align(
                level_feats[i].astype(jnp.float32)[None], rois,
                spatial_scale=1.0 / FPN_STRIDES[i], batch_inds=binds,
                out_size=self.out_size, sampling_ratio=2)
            rf = nn.relu(pre(rf.astype(self.dtype)))
            acc = rf if acc is None else acc + rf
        return GeneralizedAttention(dtype=self.dtype, name="post_module")(
            acc.astype(jnp.float32))


# ---------------------------------------------------------------------------
# GA-RPN head
# ---------------------------------------------------------------------------


class GARPNHead(nn.Module):
    """ga_rpn_head.py:16: 3x3 rpn conv + relu, then the GuidedAnchorHead
    single-level branches — 1x1 loc (objectness), 1x1 shape (dw, dh),
    offset-driven DeformConv feature adaption, 1x1 binary cls + 1x1 reg."""

    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype, name="rpn_conv")
        loc_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="conv_loc")
        shape_out = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_shape")
        offset_fc = nn.Conv(18, (1, 1), use_bias=False, dtype=self.dtype,
                            name="offset_conv")
        adapt = AdaptiveDCN(self.feat_channels, name="feature_adaption")
        cls_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="conv_cls")
        reg_out = nn.Conv(4, (1, 1), dtype=self.dtype, name="conv_reg")
        outs = []
        for x in feats:
            x = nn.relu(rpn_conv(x.astype(self.dtype)))
            loc = loc_out(x).astype(jnp.float32)
            shape = shape_out(x).astype(jnp.float32)
            # FeatureAdaption (guided_anchor_head.py:23-63): 1x1 conv on the
            # detached shape pred produces the 3x3 DCN offsets
            off = offset_fc(jax.lax.stop_gradient(shape))
            xa = nn.relu(adapt(x.astype(jnp.float32),
                               off.astype(jnp.float32)))
            xa = xa.astype(self.dtype)
            outs.append((cls_out(xa).astype(jnp.float32),
                         reg_out(xa).astype(jnp.float32), shape, loc))
        return tuple(outs)


def ga_rpn_squares(featmap_sizes, strides=FPN_STRIDES) -> np.ndarray:
    gen = AnchorGenerator(strides=tuple(strides), ratios=(1.0,),
                          scales=(GA_RPN_SQUARE,))
    return np.concatenate(gen.grid_anchors(featmap_sizes))


def ga_rpn_approx_overlaps(gt_boxes, featmap_sizes, strides=FPN_STRIDES):
    gen = AnchorGenerator(strides=tuple(strides), ratios=(0.5, 1.0, 2.0),
                          octave_base_scale=GA_RPN_OCTAVE,
                          scales_per_octave=3)
    approxs = jnp.asarray(np.concatenate(gen.grid_anchors(featmap_sizes)))
    per_octave = gen.num_base_anchors
    ov = box_ops.bbox_overlaps(gt_boxes, approxs)
    return jnp.max(ov.reshape(gt_boxes.shape[0], -1, per_octave), axis=-1)


def ga_rpn_guided_anchors(shape_pred, stride, h, w):
    """Guided anchors with the ga_rpn anchor coder stds (.07,.07,.14,.14):
    w = s * exp(dw * 0.14) around the square base (scale 8)."""
    cy = jnp.arange(h, dtype=jnp.float32)[:, None] * stride
    cx = jnp.arange(w, dtype=jnp.float32)[None, :] * stride
    s = GA_RPN_SQUARE * stride
    aw = s * jnp.exp(shape_pred[..., 0] * GA_RPN_ANCHOR_STDS[2])
    ah = s * jnp.exp(shape_pred[..., 1] * GA_RPN_ANCHOR_STDS[3])
    a = jnp.stack([
        jnp.broadcast_to(cx, (h, w)) - aw / 2,
        jnp.broadcast_to(cy, (h, w)) - ah / 2,
        jnp.broadcast_to(cx, (h, w)) + aw / 2,
        jnp.broadcast_to(cy, (h, w)) + ah / 2,
    ], axis=-1)
    return a.reshape(-1, 4)


class GARPNLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_shape: jnp.ndarray
    loss_loc: jnp.ndarray


def ga_rpn_loss(level_outs, gt_boxes, gt_valid, rng, img_shape,
                strides=FPN_STRIDES) -> GARPNLossOut:
    """GA-RPN loss (ga_rpn_head.py:43-65 -> GuidedAnchorHead.loss with
    cls_out_channels=1): focal loc loss on the center-region targets
    (octave_base_scale 8), BoundedIoU shape loss under the ApproxMaxIoU
    .7/.3/.3 assigner, and BCE + SmoothL1 on the guided anchors with the
    RPN assigner (.7/.3/.3) and a 256@0.5 random sampler."""
    featmap_sizes = [(c.shape[-3], c.shape[-2]) for c, _, _, _ in level_outs]
    gt_labels = jnp.zeros((gt_boxes.shape[0],), jnp.int32)

    # loc branch (shared ga_loc_targets with octave 8 on the FPN strides)
    loc_pairs, loc_avg = ga_loc_targets(
        gt_boxes, gt_valid, featmap_sizes, strides=strides,
        octave_base_scale=GA_RPN_OCTAVE)
    loss_loc = 0.0
    for (tgt, wgt), (_, _, _, loc) in zip(loc_pairs, level_outs):
        p = jax.nn.sigmoid(loc.reshape(tgt.shape).astype(jnp.float32))
        pt = jnp.where(tgt > 0, p, 1 - p)
        alpha_t = jnp.where(tgt > 0, 0.25, 0.75)
        fl = alpha_t * (1 - pt) ** 2 * (-jnp.log(jnp.clip(pt, 1e-8)))
        loss_loc = loss_loc + jnp.sum(fl * wgt) / loc_avg

    # shape branch: ApproxMaxIoU (.7/.3/.3) on the squares
    squares = jnp.asarray(ga_rpn_squares(featmap_sizes, strides))
    shape_all = jnp.concatenate(
        [s.reshape(-1, 2).astype(jnp.float32) for _, _, s, _ in level_outs])
    overlaps = ga_rpn_approx_overlaps(gt_boxes, featmap_sizes, strides)
    sh_assign = assigners.max_iou_assign(
        None, gt_boxes, gt_labels, gt_valid, 0.7, 0.3, min_pos_iou=0.3,
        overlaps=overlaps)
    sh_pos = sh_assign.assigned_gt_inds > 0
    sh_matched = gt_boxes[jnp.clip(sh_assign.assigned_gt_inds - 1, 0,
                                   gt_boxes.shape[0] - 1)]
    scx = (squares[:, 0] + squares[:, 2]) * 0.5
    scy = (squares[:, 1] + squares[:, 3]) * 0.5
    sw = squares[:, 2] - squares[:, 0]
    sh = squares[:, 3] - squares[:, 1]
    pw = sw * jnp.exp(shape_all[:, 0] * GA_RPN_ANCHOR_STDS[2])
    ph = sh * jnp.exp(shape_all[:, 1] * GA_RPN_ANCHOR_STDS[3])
    pred_anchors = jnp.stack(
        [scx - pw / 2, scy - ph / 2, scx + pw / 2, scy + ph / 2], axis=-1)
    sh_num_pos = jnp.maximum(jnp.sum(sh_pos), 1.0)
    loss_shape = losses.bounded_iou_loss(
        pred_anchors, sh_matched, beta=0.2,
        weight=sh_pos.astype(jnp.float32), avg_factor=sh_num_pos)

    # cls/reg on the guided anchors: RPN-style BCE + SmoothL1, sampled
    all_cls, all_reg, all_anchors = [], [], []
    for li, (cls, reg, shape, _) in enumerate(level_outs):
        h, w = featmap_sizes[li]
        anc = ga_rpn_guided_anchors(shape.reshape(h, w, 2), strides[li], h, w)
        all_cls.append(cls.reshape(-1).astype(jnp.float32))
        all_reg.append(reg.reshape(-1, 4).astype(jnp.float32))
        all_anchors.append(jax.lax.stop_gradient(anc))
    cls_all = jnp.concatenate(all_cls)
    reg_all = jnp.concatenate(all_reg)
    anchors = jnp.concatenate(all_anchors)
    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid, 0.7, 0.3, min_pos_iou=0.3)
    sample = assigners.random_sample_masks(assign, rng, 256, 0.5)
    pos = sample.pos_mask
    sel = pos | sample.neg_mask
    avg = jnp.maximum(jnp.sum(sel), 1.0)
    tgt_cls = pos.astype(jnp.float32)
    bce = (jnp.maximum(cls_all, 0) - cls_all * tgt_cls
           + jnp.log1p(jnp.exp(-jnp.abs(cls_all))))
    loss_cls = jnp.sum(bce * sel) / avg
    matched = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                gt_boxes.shape[0] - 1)]
    tgt = box_ops.bbox2delta(anchors, matched, stds=GA_RPN_BBOX_STDS)
    loss_bbox = losses.smooth_l1_loss(
        reg_all, tgt, beta=1.0, weight=pos[:, None].astype(jnp.float32),
        avg_factor=avg)
    return GARPNLossOut(loss_cls, loss_bbox, loss_shape, loss_loc)


def ga_rpn_proposals(level_outs, img_shape, nms_pre: int = 1000,
                     nms_post: int = 300, iou_threshold: float = 0.7,
                     loc_thr: float = 0.01,
                     strides=FPN_STRIDES) -> rpn.Proposals:
    """GA-RPN proposal generation (ga_rpn_head.py:67-168): per level,
    sigmoid scores masked by the loc filter, top nms_pre, decode with the
    bbox coder stds, per-level NMS, then global top max_per_img."""
    all_boxes, all_scores = [], []
    for li, (cls, reg, shape, loc) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        anc = ga_rpn_guided_anchors(shape.reshape(h, w, 2), strides[li], h, w)
        keep = jax.nn.sigmoid(loc.reshape(-1)) >= loc_thr
        scores = jax.nn.sigmoid(cls.reshape(-1)) * keep
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        k = min(nms_pre, scores.shape[0])
        top_s, top_i = jax.lax.top_k(scores, k)
        decoded = box_ops.delta2bbox(anc[top_i], deltas[top_i],
                                     stds=GA_RPN_BBOX_STDS,
                                     max_shape=img_shape)
        res = nms_ops.nms_fixed(decoded, top_s, iou_threshold,
                                max_out=min(nms_post, k))
        all_boxes.append(res.boxes)
        all_scores.append(jnp.where(res.valid, res.scores, -1.0))
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    k = min(nms_post, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    return rpn.Proposals(boxes[top_i], top_s, top_s > 0)


# ---------------------------------------------------------------------------
# The FPN two-stage assembly
# ---------------------------------------------------------------------------


class FPNFasterRCNN(nn.Module):
    """ResNet + FPN( + optional BFP) + (RPN | GA-RPN) + (level-dispatch |
    GRoIE) RoI extraction + Shared2FC head: the faster_rcnn_r50_fpn trunk
    with the ga_faster / groie / libra variants as config knobs."""

    num_classes: int = 80
    depth: int = 50
    rpn_type: str = "rpn"  # 'rpn' | 'ga'
    roi_extract: str = "single"  # 'single' | 'groie'
    with_bfp: bool = False
    pad_h: int = 800
    pad_w: int = 1344
    train_nms_post: int = 600
    test_nms_post: int = 300
    num_roi_samples: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=1, dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="maxpool", dtype=self.dtype,
                        name="neck")
        if self.with_bfp:
            self.bfp = BFP(out_channels=256, refine_level=2,
                           refine_type="non_local", dtype=jnp.float32,
                           name="bfp")
        if self.rpn_type == "ga":
            self.rpn_head = GARPNHead(dtype=self.dtype, name="rpn_head")
        else:
            self.rpn_head = rpn.RPNHead(
                feat_channels=256, num_base_anchors=3, dtype=self.dtype,
                name="rpn_head")
        if self.roi_extract == "groie":
            self.roi_extractor = GenericRoIExtractor(
                dtype=jnp.float32, name="roi_extractor")
        self.bbox_head = bh.Shared2FCBBoxHead(
            num_classes=self.num_classes, with_selsa=False,
            dtype=jnp.float32, name="bbox_head")

    def extract_feat(self, imgs):
        feats = self.neck(self.backbone(imgs))
        if self.with_bfp:
            feats = self.bfp(feats)
        return feats

    def rpn_forward(self, level_feats):
        return self.rpn_head(level_feats)

    def roi_feats(self, level_feats, rois):
        """level_feats: per-level [H, W, C] (batch removed)."""
        if self.roi_extract == "groie":
            return self.roi_extractor(level_feats[:4], rois)
        return multilevel_roi_align(level_feats[:4], rois)

    def bbox_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, imgs):
        feats = self.extract_feat(imgs)
        outs = self.rpn_forward(feats)
        rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 4)
        rf = self.roi_feats([f[0] for f in feats], rois)
        return outs, self.bbox_forward(rf)


class FPNDetBatch(NamedTuple):
    img: jnp.ndarray
    img_shape: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray


def _fpn_proposals(model, outs, img_shape, anchors, train: bool):
    post = model.train_nms_post if train else model.test_nms_post
    if model.rpn_type == "ga":
        return ga_rpn_proposals([o for o in outs], img_shape,
                                nms_post=post)
    return rpn.rpn_proposals(
        [(c[0], r[0]) for c, r in outs], anchors, img_shape,
        nms_pre=2000, nms_post=post, iou_threshold=0.7)


def fpn_faster_rcnn_loss(model: FPNFasterRCNN, params, batch: FPNDetBatch,
                         rng: jax.Array, anchors,
                         sampler: str = "random",
                         reg_loss: str = "smooth_l1"):
    """Two-stage FPN training loss; ``sampler='iou_balanced'`` +
    ``reg_loss='balanced_l1'`` = Libra R-CNN's rcnn recipe."""
    rng_rpn, rng_roi = jax.random.split(rng)
    feats = model.apply(params, batch.img[None],
                        method=FPNFasterRCNN.extract_feat)
    outs = model.apply(params, feats, method=FPNFasterRCNN.rpn_forward)

    if model.rpn_type == "ga":
        ga = ga_rpn_loss(outs, batch.gt_boxes, batch.gt_valid, rng_rpn,
                         batch.img_shape)
        rpn_metrics = {"loss_rpn_cls": ga.loss_cls,
                       "loss_rpn_bbox": ga.loss_bbox,
                       "loss_anchor_shape": ga.loss_shape,
                       "loss_anchor_loc": ga.loss_loc}
        rpn_total = sum(rpn_metrics.values())
    else:
        ls = rpn.rpn_loss([(c[0], r[0]) for c, r in outs], anchors,
                          batch.gt_boxes, batch.gt_valid, rng_rpn,
                          batch.img_shape)
        rpn_metrics = {"loss_rpn_cls": ls.loss_cls,
                       "loss_rpn_bbox": ls.loss_bbox}
        rpn_total = ls.loss_cls + ls.loss_bbox

    props = _fpn_proposals(model, outs, batch.img_shape, anchors, True)
    cand = jnp.concatenate([batch.gt_boxes, props.boxes], axis=0)
    cand_valid = jnp.concatenate([batch.gt_valid, props.valid], axis=0)
    pos_thr = 0.6 if model.rpn_type == "ga" else 0.5
    assign = assigners.max_iou_assign(
        cand, batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        pos_thr, pos_thr, pos_thr, box_valid=cand_valid)
    if sampler == "iou_balanced":
        sample = assigners.iou_balanced_sample_gather(
            assign, rng_roi, model.num_roi_samples, 0.25)
    else:
        sample = assigners.random_sample_gather(
            assign, rng_roi, model.num_roi_samples, 0.25)

    rois = cand[sample.inds]
    matched = jnp.clip(assign.assigned_gt_inds[sample.inds] - 1, 0,
                       batch.gt_boxes.shape[0] - 1)
    pos = sample.is_pos
    labels = jnp.where(pos, batch.gt_labels[matched],
                       model.num_classes).astype(jnp.int32)
    stds = (0.1, 0.1, 0.2, 0.2)
    tgt = box_ops.bbox2delta(rois, batch.gt_boxes[matched], stds=stds)
    tgt = jnp.where(pos[:, None], tgt, 0.0)

    rf = model.apply(params, [f[0] for f in feats], rois,
                     method=FPNFasterRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf,
                                       method=FPNFasterRCNN.bbox_forward)
    avg = jnp.maximum(jnp.sum(sample.is_valid), 1.0)
    loss_cls = losses.softmax_cross_entropy(
        cls_score.astype(jnp.float32), labels,
        weight=sample.is_valid.astype(jnp.float32), avg_factor=avg)
    pred = bbox_pred.reshape(-1, model.num_classes, 4).astype(jnp.float32)
    cls_idx = jnp.clip(labels, 0, model.num_classes - 1)
    pred_c = jnp.take_along_axis(pred, cls_idx[:, None, None], axis=1)[:, 0]
    if reg_loss == "balanced_l1":
        loss_bbox = losses.balanced_l1_loss(
            pred_c, tgt, weight=pos[:, None].astype(jnp.float32),
            avg_factor=avg)
    else:
        loss_bbox = losses.smooth_l1_loss(
            pred_c, tgt, beta=1.0, weight=pos[:, None].astype(jnp.float32),
            avg_factor=avg)
    total = rpn_total + loss_cls + loss_bbox
    metrics = {"loss": total, "loss_cls": loss_cls, "loss_bbox": loss_bbox}
    metrics.update(rpn_metrics)
    return total, metrics


def fpn_faster_rcnn_detect(model: FPNFasterRCNN, params, img, img_shape,
                           anchors, scale_factor=None):
    feats = model.apply(params, img[None], method=FPNFasterRCNN.extract_feat)
    outs = model.apply(params, feats, method=FPNFasterRCNN.rpn_forward)
    props = _fpn_proposals(model, outs, img_shape, anchors, False)
    rf = model.apply(params, [f[0] for f in feats], props.boxes,
                     method=FPNFasterRCNN.roi_feats)
    cls_score, bbox_pred = model.apply(params, rf,
                                       method=FPNFasterRCNN.bbox_forward)
    return bh.bbox_decode(props.boxes, cls_score, bbox_pred, img_shape,
                          roi_valid=props.valid, scale_factor=scale_factor,
                          stds=(0.1, 0.1, 0.2, 0.2))
