"""RepPoints: point-set object representation with two-stage refinement.

Parity target: mmdetection/mmdet/models/dense_heads/reppoints_head.py:1-763
and configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py —
- each location carries 9 points; stage 1 (init) predicts their offsets from
  a conv; stage 2 (refine) runs a DeformConv sampled AT the init points
  (gradient_mul=0.1 on the offset path) for both the cls branch and the
  refined offsets (added to the init points);
- points -> box via the MOMENT transfer: center = mean(points),
  half-extent = std(points) * exp(moment_transfer * moment_mul), with
  learnable per-axis moment_transfer (reppoints_head.py points2bbox);
- targets: init stage assigns each gt to its nearest same-level point by
  gt-normalized distance (PointAssigner scale=4 pos_num=1, joint over
  levels); refine stage re-assigns by MaxIoU (.5/.4/min_pos 0) against the
  DETACHED init-decoded boxes; SmoothL1 box losses (beta .11; init w=0.5,
  refine w=1.0) in point_base_scale*stride-normalized coordinates, focal
  cls on the refine stage averaged by the refine positive count.

TPU-native: point sets are dense [P, 9, 2] tensors; the nearest-point
assignment is a masked [P, G] distance matrix + a sequential-conflict
fori_loop (core/assigners.py point_assign).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses, nms as nms_ops
from ...ops.deform_conv import deform_conv
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

REP_STRIDES = (8, 16, 32, 64, 128)
NUM_POINTS = 9


class PointsDCN(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, offset):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return jax.vmap(lambda xi, oi: deform_conv(xi, oi, w, b))(x, offset)


class RepPointsHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    gradient_mul: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        convs = {b: [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f"{b}_conv{i}")
                     for i in range(self.stacked_convs)]
                 for b in ("cls", "reg")}
        init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                            padding=[(1, 1)] * 2, dtype=self.dtype,
                            name="reppoints_pts_init_conv")
        init_out = nn.Conv(2 * NUM_POINTS, (1, 1), dtype=self.dtype,
                           name="reppoints_pts_init_out")
        cls_dcn = PointsDCN(self.point_feat_channels, name="reppoints_cls_conv")
        cls_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="reppoints_cls_out")
        refine_dcn = PointsDCN(self.point_feat_channels,
                               name="reppoints_pts_refine_conv")
        refine_out = nn.Conv(2 * NUM_POINTS, (1, 1), dtype=self.dtype,
                             name="reppoints_pts_refine_out")

        # base 3x3 grid (dy, dx) the DCN offsets are relative to
        base = jnp.asarray(
            [(dy, dx) for dy in (-1.0, 0.0, 1.0) for dx in (-1.0, 0.0, 1.0)],
            jnp.float32).reshape(-1)

        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            pts_init = init_out(nn.relu(init_conv(r))).astype(jnp.float32)
            grad_off = (
                (1 - self.gradient_mul) * jax.lax.stop_gradient(pts_init)
                + self.gradient_mul * pts_init)
            dcn_off = grad_off - base  # relative to the 3x3 base grid
            cls = cls_out(nn.relu(
                cls_dcn(c.astype(jnp.float32), dcn_off)).astype(self.dtype))
            pts_delta = refine_out(nn.relu(
                refine_dcn(r.astype(jnp.float32), dcn_off)).astype(self.dtype)
            ).astype(jnp.float32)
            pts_refine = pts_delta + jax.lax.stop_gradient(pts_init)
            outs.append((cls, pts_init, pts_refine))
        return tuple(outs)


class MomentTransfer(nn.Module):
    """Learnable moment multipliers shared across levels
    (reppoints moment transform)."""

    moment_mul: float = 0.01

    @nn.compact
    def __call__(self, pts):
        """pts: [..., NUM_POINTS, 2] (dy, dx) in stride units, centered at
        the cell. Returns [..., 4] (x1, y1, x2, y2) in the same units."""
        mt = self.param("moment_transfer", nn.initializers.zeros, (2,))
        mt = (mt * self.moment_mul
              + jax.lax.stop_gradient(mt) * (1 - self.moment_mul))
        mean = jnp.mean(pts, axis=-2)  # [..., 2] (y, x)
        std = jnp.std(pts, axis=-2, ddof=1)  # torch.std is unbiased
        hw = std[..., 1] * jnp.exp(mt[0])
        hh = std[..., 0] * jnp.exp(mt[1])
        return jnp.stack([mean[..., 1] - hw, mean[..., 0] - hh,
                          mean[..., 1] + hw, mean[..., 0] + hh], axis=-1)


def points_to_boxes(pts_flat, centers, stride, moment_params=None,
                    moment_mul: float = 0.01):
    """pts_flat: [P, 2*NUM_POINTS] (dy, dx interleaved); centers [P, 2] (x, y)
    in image coords. Moment transform with optional learnable multipliers.
    The reference (points2bbox, reppoints_head.py:196-211) uses ``torch.std``
    — UNBIASED (ddof=1) — so the half-extent carries a sqrt(n/(n-1)) factor
    relative to the population std."""
    pts = pts_flat.reshape(-1, NUM_POINTS, 2)
    mean = jnp.mean(pts, axis=1)  # (y, x)
    std = jnp.std(pts, axis=1, ddof=1)
    if moment_params is not None:
        mt = moment_params
        mt = mt * moment_mul + jax.lax.stop_gradient(mt) * (1 - moment_mul)
        sw = jnp.exp(mt[0])
        sh = jnp.exp(mt[1])
    else:
        sw = sh = 1.0
    hw = std[:, 1] * sw * stride
    hh = std[:, 0] * sh * stride
    cx = centers[:, 0] + mean[:, 1] * stride
    cy = centers[:, 1] + mean[:, 0] * stride
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


class RepPointsLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_pts_init: jnp.ndarray
    loss_pts_refine: jnp.ndarray


def _centers(shapes):
    """Per-level point grids at ``x * stride`` — mmdet's PointGenerator
    (mmdet/core/anchor/point_generator.py:17-25) has NO half-cell offset."""
    out = []
    for (h, w), s in zip(shapes, REP_STRIDES):
        ys = jnp.arange(h, dtype=jnp.float32) * s
        xs = jnp.arange(w, dtype=jnp.float32) * s
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        out.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return out


def _smooth_l1(diff, beta):
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def reppoints_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
                   moment_params=None) -> RepPointsLossOut:
    """Exact RepPoints loss (reppoints_head.py:530-663 + the moment config):

    - init stage: PointAssigner (scale=4, pos_num=1) over the points of ALL
      levels jointly; SmoothL1 (beta=.11, weight .5) on the moment-decoded
      boxes in ``point_base_scale * stride``-normalized coords, averaged by
      the init positive count (FocalLoss => sampling=False);
    - refine stage: MaxIoU (.5/.4/min_pos 0) of the DETACHED init boxes
      (``pts_preds_init.detach()`` at loss():620) against gts, jointly over
      levels; SmoothL1 (beta=.11, weight 1) on the refine boxes;
    - cls: sigmoid focal (alpha=.25, gamma=2) with the refine assignment's
      labels, pos+neg weight 1 / ignored 0, averaged by the refine positive
      count.
    """
    from ...core import assigners

    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    centers = _centers(shapes)
    G = gt_boxes.shape[0]

    box_init_l, box_ref_l, cls_l, lvl_l, norm_l = [], [], [], [], []
    for li, (cls, p_init, p_ref) in enumerate(level_outs):
        stride = REP_STRIDES[li]
        ctr = centers[li]  # [P, 2]
        pi = p_init.reshape(-1, 2 * NUM_POINTS)
        pr = p_ref.reshape(-1, 2 * NUM_POINTS)
        box_init_l.append(points_to_boxes(pi, ctr, stride, moment_params))
        box_ref_l.append(points_to_boxes(pr, ctr, stride, moment_params))
        cls_l.append(cls.reshape(-1, num_classes).astype(jnp.float32))
        n_pts = ctr.shape[0]
        # points_lvl = log2(stride): 3..7 for strides 8..128
        lvl_l.append(jnp.full((n_pts,), li + 3, jnp.int32))
        norm_l.append(jnp.full((n_pts,), 4.0 * stride, jnp.float32))

    box_init = jnp.concatenate(box_init_l)   # [P, 4]
    box_ref = jnp.concatenate(box_ref_l)
    clsf = jnp.concatenate(cls_l)            # [P, C]
    pts_lvl = jnp.concatenate(lvl_l)
    norm = jnp.concatenate(norm_l)[:, None]  # [P, 1]
    pts_xy = jnp.concatenate(centers)        # [P, 2]

    # --- init stage
    ar_i = assigners.point_assign(pts_xy, pts_lvl, gt_boxes, gt_labels,
                                  gt_valid, scale=4.0, pos_num=1)
    pos_i = (ar_i.assigned_gt_inds > 0).astype(jnp.float32)
    tgt_i = gt_boxes[jnp.clip(ar_i.assigned_gt_inds - 1, 0, G - 1)]
    sl1_i = _smooth_l1(jnp.abs(box_init - tgt_i) / norm, 0.11)
    num_pos_i = jnp.sum(pos_i)
    loss_init = 0.5 * jnp.sum(sl1_i * pos_i[:, None]) / jnp.maximum(
        num_pos_i, 1.0)

    # --- refine stage (assign on the detached init boxes, all levels jointly)
    ar_r = assigners.max_iou_assign(
        jax.lax.stop_gradient(box_init), gt_boxes, gt_labels, gt_valid,
        pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)
    pos_r = (ar_r.assigned_gt_inds > 0).astype(jnp.float32)
    neg_r = ar_r.assigned_gt_inds == 0
    tgt_r = gt_boxes[jnp.clip(ar_r.assigned_gt_inds - 1, 0, G - 1)]
    sl1_r = _smooth_l1(jnp.abs(box_ref - tgt_r) / norm, 0.11)
    num_pos_r = jnp.sum(pos_r)
    denom_r = jnp.maximum(num_pos_r, 1.0)
    loss_refine = jnp.sum(sl1_r * pos_r[:, None]) / denom_r

    onehot = jax.nn.one_hot(
        jnp.clip(ar_r.labels, 0, num_classes - 1), num_classes
    ) * pos_r[:, None]
    wvec = jnp.maximum(pos_r, neg_r.astype(jnp.float32))[:, None]
    loss_cls = losses.sigmoid_focal_loss(
        clsf, onehot, weight=wvec, avg_factor=denom_r)

    return RepPointsLossOut(loss_cls, loss_init, loss_refine)


def reppoints_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                     score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                     scale_factor=None, moment_params=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _, _ in level_outs]
    centers = _centers(shapes)
    all_b, all_s, all_l = [], [], []
    h_img, w_img = img_shape[0], img_shape[1]
    for li, (cls, _, p_ref) in enumerate(level_outs):
        boxes = points_to_boxes(p_ref.reshape(-1, 2 * NUM_POINTS),
                                centers[li], REP_STRIDES[li], moment_params)
        boxes = jnp.clip(boxes, 0.0,
                         jnp.asarray([w_img, h_img, w_img, h_img], jnp.float32))
        scores = jax.nn.sigmoid(cls.reshape(-1, num_classes).astype(jnp.float32))
        flat = scores.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        all_b.append(boxes[top_i // num_classes])
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


class RepPointsDetector(nn.Module):
    """ResNet + FPN + RepPointsHead (mmdet/models/detectors/reppoints_detector.py)."""

    num_classes: int = 80
    depth: int = 50
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                               frozen_stages=1, dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        add_extra_convs="on_input", dtype=self.dtype,
                        name="neck")
        self.bbox_head = RepPointsHead(num_classes=self.num_classes,
                                       dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
