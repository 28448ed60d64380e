"""FSAF: anchor-free RetinaNet branch with online feature-level selection.

Parity target: mmdetection/mmdet/models/dense_heads/fsaf_head.py:15-422 and
configs/fsaf/fsaf_r50_fpn_1x_coco.py:
- RetinaNet tower with ONE anchor per cell (octave_base_scale=1, ratios [1]);
- relu on the reg branch (TBLR distances must be positive, fsaf_head.py:60);
- CenterRegionAssigner(pos_scale=.2, neg_scale=.2, min_pos_iof=.01), joint
  over levels: positive = center strictly in gt AND anchor-box IoF with the
  0.2 core > .01, smallest-area gt wins; shadow pairs zero the gt's class
  channel, same-class-shadowed positives demote to background;
- TBLRBBoxCoder(normalizer=4): targets = (t,b,l,r) / (4 * stride); preds
  clamped at 1e-4 before decode;
- element-wise focal cls + -log(IoU) reg losses, then ONLINE LEVEL SELECTION
  (fsaf_head.py:262-291, 371-422): per (gt, level) mean loss over that gt's
  positives, each gt keeps only its argmin level; positives of other levels
  lose the reg loss and their own label's cls channel; averaged by the
  post-selection positive count.

TPU-native: the per-gt loops become [P, G] masks and segment means; the
level selection is a [L, G] argmin — all fused, no host sync.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses, nms as nms_ops
from ..backbones.resnet import ResNet
from ..necks.fpn import FPN

FSAF_STRIDES = (8, 16, 32, 64, 128)


class FSAFHead(nn.Module):
    """Retina tower, 1 anchor/cell, relu'd TBLR regression."""

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
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name="retina_cls")
        # bias 0.25 prevents zero-area boxes at init (fsaf init_weights)
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          bias_init=nn.initializers.constant(0.25),
                          name="retina_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for conv in convs["cls"]:
                c = nn.relu(conv(c))
            for conv in convs["reg"]:
                r = nn.relu(conv(r))
            outs.append((cls_out(c),
                         nn.relu(reg_out(r).astype(jnp.float32))))
        return tuple(outs)


class FSAFLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray


def _centers(h, w, stride):
    """Anchor centers at ``x * stride``: the FSAF config's 1x-stride square
    anchors come from AnchorGenerator with default center_offset=0."""
    ys = jnp.arange(h, dtype=jnp.float32) * stride
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return gx.reshape(-1), gy.reshape(-1)


def _tblr_decode(px, py, pred, stride, normalizer=4.0):
    """TBLRBBoxCoder.decode: distances = pred * normalizer * stride."""
    d = pred * (normalizer * stride)
    return jnp.stack([px - d[:, 2], py - d[:, 0],
                      px + d[:, 3], py + d[:, 1]], axis=-1)


def fsaf_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
              pos_scale: float = 0.2, neg_scale: float = 0.2,
              normalizer: float = 4.0) -> FSAFLossOut:
    """Exact FSAF loss (fsaf_head.py:177-422 + fsaf_r50 config):

    - joint CenterRegionAssigner (.2/.2, min_pos_iof .01) over the 1x-stride
      square anchors of ALL levels: positives need center-in-gt AND
      anchor-box IoF with the 0.2 core > 0.01, smallest-area gt wins;
      shadow pairs get their gt's class channel zeroed in the focal loss,
      same-class-shadowed positives are demoted (core/assigners.py
      center_region_assign);
    - element-wise sigmoid focal (alpha .25 gamma 2) and -log(IoU) on the
      TBLR decode of the clamped (min 1e-4, fsaf loss():202-204) preds;
    - ONLINE LEVEL SELECTION (:262-291): per (gt, level) MEAN of
      (cls.sum(classes) + reg) over that gt's positives — computed on the
      shadow-weighted element losses — 1e6 where none; each gt keeps only
      its argmin level, positives of other levels lose their reg loss and
      their own label's cls channel (:371-422);
    - both sums averaged by the post-selection positive count
      (num_total_neg fallback when zero, :293-297).
    """
    from ...core import assigners

    G = gt_boxes.shape[0]
    cls_l, reg_l, anc_l, px_l, py_l, lvl_sizes = [], [], [], [], [], []
    for li, (cls, reg) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        stride = float(FSAF_STRIDES[li])
        px, py = _centers(h, w, stride)
        cls_l.append(cls.reshape(-1, num_classes).astype(jnp.float32))
        # reference clamps the (relu'd) distances at 1e-4 before decode
        reg_l.append(jnp.maximum(reg.reshape(-1, 4), 1e-4))
        anc_l.append(jnp.stack([px - stride / 2, py - stride / 2,
                                px + stride / 2, py + stride / 2], axis=-1))
        px_l.append(px)
        py_l.append(py)
        lvl_sizes.append(px.shape[0])

    clsf = jnp.concatenate(cls_l)        # [A, C]
    anchors = jnp.concatenate(anc_l)     # [A, 4]
    lvl_of = jnp.concatenate([
        jnp.full((n,), li, jnp.int32) for li, n in enumerate(lvl_sizes)])

    ar, shadowed = assigners.center_region_assign(
        anchors, gt_boxes, gt_labels, gt_valid, pos_scale, neg_scale)
    pos = ar.assigned_gt_inds > 0
    best = jnp.clip(ar.assigned_gt_inds - 1, 0, G - 1)
    lab = jnp.where(pos, ar.labels, num_classes)

    onehot = jax.nn.one_hot(jnp.clip(lab, 0, num_classes - 1),
                            num_classes) * pos[:, None]
    # element-wise focal (reduction='none'), numerically stable BCE
    ce = (jnp.maximum(clsf, 0) - clsf * onehot
          + jnp.log1p(jnp.exp(-jnp.abs(clsf))))
    p = jax.nn.sigmoid(clsf)
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
    cls_elem = alpha_t * ((1 - pt) ** 2.0) * ce  # [A, C]
    # shadow pairs zero the pair's gt class channel (label_weights[idx, c]=0)
    shadow_ch = (shadowed.astype(jnp.float32)
                 @ jax.nn.one_hot(jnp.clip(gt_labels, 0, num_classes - 1),
                                  num_classes)) > 0  # [A, C]
    cls_w = jnp.where(shadow_ch, 0.0, 1.0)
    cls_elem = cls_elem * cls_w

    # -log IoU of the decoded TBLR boxes vs the matched gt (pos only)
    dec_l = []
    off = 0
    for li, n in enumerate(lvl_sizes):
        dec_l.append(_tblr_decode(px_l[li], py_l[li],
                                  jnp.concatenate(reg_l)[off:off + n],
                                  float(FSAF_STRIDES[li]), normalizer))
        off += n
    dec = jnp.concatenate(dec_l)
    gb = gt_boxes[best]
    ix1 = jnp.maximum(dec[:, 0], gb[:, 0])
    iy1 = jnp.maximum(dec[:, 1], gb[:, 1])
    ix2 = jnp.minimum(dec[:, 2], gb[:, 2])
    iy2 = jnp.minimum(dec[:, 3], gb[:, 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    a1 = jnp.maximum(dec[:, 2] - dec[:, 0], 0) * jnp.maximum(
        dec[:, 3] - dec[:, 1], 0)
    a2 = jnp.maximum(gb[:, 2] - gb[:, 0], 0) * jnp.maximum(
        gb[:, 3] - gb[:, 1], 0)
    iou = inter / jnp.maximum(a1 + a2 - inter, 1e-6)
    reg_elem = -jnp.log(jnp.clip(iou, 1e-6)) * pos  # [A]

    # online level selection: per-(level, gt) mean of the weighted elem loss
    elem = jnp.sum(cls_elem, axis=-1) + reg_elem  # [A]
    member = (pos[:, None] & (best[:, None] == jnp.arange(G)[None, :]))
    L = len(level_outs)
    lvl_onehot = jax.nn.one_hot(lvl_of, L, dtype=jnp.float32)  # [A, L]
    cnt = jnp.einsum("al,ag->lg", lvl_onehot, member.astype(jnp.float32))
    tot = jnp.einsum("al,ag->lg", lvl_onehot,
                     member.astype(jnp.float32) * elem[:, None])
    level_loss = jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1), 1e6)  # [L, G]
    min_level = jnp.argmin(level_loss, axis=0)  # [G]

    keep = pos & (min_level[best] == lvl_of)
    demoted = pos & ~keep
    onehot_dem = jax.nn.one_hot(
        jnp.clip(lab, 0, num_classes - 1), num_classes) * demoted[:, None]
    total_cls = jnp.sum(cls_elem * (1.0 - onehot_dem))
    total_reg = jnp.sum(reg_elem * keep)
    num_pos = jnp.sum(keep)

    denom = jnp.where(num_pos > 0, num_pos,
                      num_pos + jnp.sum(ar.assigned_gt_inds == 0))
    denom = jnp.maximum(denom, 1.0).astype(jnp.float32)
    return FSAFLossOut(total_cls / denom, total_reg / denom)


def fsaf_decode(level_outs, img_shape, num_classes, nms_pre=1000,
                score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                scale_factor=None, normalizer: float = 4.0) -> nms_ops.DetResult:
    all_b, all_s, all_l = [], [], []
    h_img, w_img = img_shape[0], img_shape[1]
    for li, (cls, reg) in enumerate(level_outs):
        h, w = cls.shape[-3], cls.shape[-2]
        px, py = _centers(h, w, FSAF_STRIDES[li])
        boxes = _tblr_decode(px, py, reg.reshape(-1, 4), FSAF_STRIDES[li],
                             normalizer)
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


class FSAF(nn.Module):
    """ResNet + FPN + FSAFHead (mmdet/models/detectors/fsaf.py)."""

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
        self.bbox_head = FSAFHead(num_classes=self.num_classes,
                                  dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.neck(self.backbone(imgs)))
