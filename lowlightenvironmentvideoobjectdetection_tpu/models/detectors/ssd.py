"""SSD-300: VGG-16 backbone + multi-level anchor head.

Parity targets:
- SSDVGG backbone: mmdetection/mmdet/models/backbones/ssd_vgg.py — VGG16
  convs through conv5_3, dilated fc6/fc7 as convs, L2-normalized conv4_3
  feature, extra 1x1/3x3-s2 conv pairs → 6 detection levels
  (38, 19, 10, 5, 3, 1 for input 300).
- SSDHead: mmdet/models/dense_heads/ssd_head.py:16 — per-level anchors
  (scale_major SSD anchors: min/max sizes per level + extra ratios),
  softmax CE with 3:1 hard negative mining + SmoothL1 regression.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import assigners, boxes as box_ops, losses, nms as nms_ops

# SSD300 anchor spec (ssd300_coco config): strides, min/max sizes, ratios
SSD_STRIDES = (8, 16, 32, 64, 100, 300)


def ssd_sizes(input_size: int = 300,
              basesize_ratio_range=(0.15, 0.9),
              num_levels: int = 6):
    """SSDAnchorGenerator's size-table derivation
    (mmdet/core/anchor/anchor_generator.py:382-406): int-truncated ratio
    steps plus the special-cased first level — (0.15, 0.9) is the ssd300
    COCO config (first level 21/45), (0.2, 0.9) the VOC one (30/60)."""
    mn, mx = basesize_ratio_range
    min_ratio, max_ratio = int(mn * 100), int(mx * 100)
    step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for ratio in range(min_ratio, max_ratio + 1, step):
        min_sizes.append(int(input_size * ratio / 100))
        max_sizes.append(int(input_size * (ratio + step) / 100))
    if input_size == 300 and mn == 0.15:  # COCO
        min_sizes.insert(0, int(input_size * 7 / 100))
        max_sizes.insert(0, int(input_size * 15 / 100))
    elif input_size == 300 and mn == 0.2:  # VOC
        min_sizes.insert(0, int(input_size * 10 / 100))
        max_sizes.insert(0, int(input_size * 20 / 100))
    elif input_size == 512 and mn == 0.1:  # COCO
        min_sizes.insert(0, int(input_size * 4 / 100))
        max_sizes.insert(0, int(input_size * 10 / 100))
    elif input_size == 512 and mn == 0.15:  # VOC
        min_sizes.insert(0, int(input_size * 7 / 100))
        max_sizes.insert(0, int(input_size * 15 / 100))
    else:
        raise ValueError((input_size, basesize_ratio_range))
    return tuple(min_sizes), tuple(max_sizes)


# the ssd300_coco table: (21, 45, 99, 153, 207, 261) / (45, 99, ..., 315).
# Round 4: the previous hard-coded table was the VOC one (30, 60, ...) on
# both sides of its transcription golden — caught by running the
# reference's own SSDAnchorGenerator (tests/test_ref_code_goldens.py).
SSD_MIN_SIZES, SSD_MAX_SIZES = ssd_sizes()
SSD_RATIOS = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))


def ssd_num_anchors(level: int) -> int:
    return 2 + 2 * len(SSD_RATIOS[level])


def ssd_anchors(shapes: Sequence[Tuple[int, int]]) -> list:
    """Per-level [H*W*A, 4] xyxy anchors (SSDAnchorGenerator semantics)."""
    out = []
    for li, (h, w) in enumerate(shapes):
        s = SSD_STRIDES[li]
        mn, mx = float(SSD_MIN_SIZES[li]), float(SSD_MAX_SIZES[li])
        whs = [(mn, mn), (np.sqrt(mn * mx), np.sqrt(mn * mx))]
        for r in SSD_RATIOS[li]:
            sr = np.sqrt(r)
            # mmdet SSDAnchorGenerator order (anchor_generator.py:418-454):
            # ratio list per pair is [1/r, r] with the h/w convention
            # (h_ratios=sqrt(ratio)), so the WIDE anchor of each pair comes
            # first; the index-select [0, A, 1, 2, ...] hoists the sqrt-size
            # square to slot 1
            whs.append((mn * sr, mn / sr))
            whs.append((mn / sr, mn * sr))
        whs = np.asarray(whs, np.float32)  # [A, 2]
        cx = (np.arange(w, dtype=np.float32) + 0.5) * s
        cy = (np.arange(h, dtype=np.float32) + 0.5) * s
        gy, gx = np.meshgrid(cy, cx, indexing="ij")
        centers = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # [HW, 2]
        a = np.concatenate([
            centers[:, None] - whs[None] / 2, centers[:, None] + whs[None] / 2,
        ], axis=-1)  # [HW, A, 4]
        out.append(jnp.asarray(a.reshape(-1, 4)))
    return out


def _vgg_block(x, ch, n, dtype, name, pool=True, ceil=False):
    for i in range(n):
        x = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, dtype=dtype,
                            name=f"{name}_{i}")(x))
    if pool:
        if ceil and x.shape[-3] % 2:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, 1), (0, 1), (0, 0)],
                        mode="edge")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    return x


class SSDVGG(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = _vgg_block(x, 64, 2, d, "conv1")
        x = _vgg_block(x, 128, 2, d, "conv2")
        x = _vgg_block(x, 256, 3, d, "conv3", ceil=True)
        x = _vgg_block(x, 512, 3, d, "conv4", pool=False)
        f4 = x  # conv4_3: stride 8
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, 512, 3, d, "conv5", pool=False)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        # dilated fc6 + fc7
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6)] * 2,
                            kernel_dilation=(6, 6), dtype=d, name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=d, name="fc7")(x))
        f7 = x  # stride 16
        # extras: conv8-conv11
        feats = [None, f7]
        chans = ((256, 512), (128, 256), (128, 256), (128, 256))
        strides = (2, 2, 1, 1)
        pads = (1, 1, 0, 0)
        for i, ((c1, c2), s, p) in enumerate(zip(chans, strides, pads)):
            x = nn.relu(nn.Conv(c1, (1, 1), dtype=d, name=f"extra{i}_1")(x))
            x = nn.relu(nn.Conv(c2, (3, 3), strides=(s, s),
                                padding=[(p, p)] * 2, dtype=d,
                                name=f"extra{i}_2")(x))
            feats.append(x)
        # L2-normalize conv4_3 with learnable per-channel scale (init 20)
        gamma = self.param("l2_norm_scale",
                           nn.initializers.constant(20.0), (512,))
        f4 = f4 / jnp.maximum(
            jnp.linalg.norm(f4.astype(jnp.float32), axis=-1, keepdims=True),
            1e-10,
        ) * gamma
        feats[0] = f4.astype(d)
        return tuple(feats)


class SSDHead(nn.Module):
    num_classes: int = 80
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        outs = []
        for i, x in enumerate(feats):
            a = ssd_num_anchors(i)
            cls = nn.Conv(a * (self.num_classes + 1), (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name=f"cls{i}")(x)
            reg = nn.Conv(a * 4, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name=f"reg{i}")(x)
            outs.append((cls, reg))
        return tuple(outs)


class SSD(nn.Module):
    """SSD-300 (mmdet/models/detectors/single_stage.py + ssd configs)."""

    num_classes: int = 80
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = SSDVGG(dtype=self.dtype, name="backbone")
        self.bbox_head = SSDHead(num_classes=self.num_classes,
                                 dtype=self.dtype, name="bbox_head")

    def __call__(self, imgs):
        return self.bbox_head(self.backbone(imgs))


SSD_STDS = (0.1, 0.1, 0.2, 0.2)


class SSDLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray


def ssd_loss(level_outs, gt_boxes, gt_labels, gt_valid, num_classes,
             neg_pos_ratio: int = 3) -> SSDLossOut:
    """CE with hard negative mining (3:1) + SmoothL1 (ssd_head.py loss)."""
    shapes = [(c.shape[-3], c.shape[-2]) for c, _ in level_outs]
    anchors = jnp.concatenate(ssd_anchors(shapes))
    cls_all = jnp.concatenate(
        [c.reshape(-1, num_classes + 1).astype(jnp.float32)
         for c, _ in level_outs])
    reg_all = jnp.concatenate(
        [r.reshape(-1, 4).astype(jnp.float32) for _, r in level_outs])

    assign = assigners.max_iou_assign(
        anchors, gt_boxes, gt_labels, gt_valid,
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
    )
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    # SSD convention: background = class index num_classes
    tgt = jnp.where(pos, jnp.clip(assign.labels, 0, num_classes - 1),
                    num_classes)
    per_ce = -jax.nn.log_softmax(cls_all)[
        jnp.arange(cls_all.shape[0]), tgt]
    # hard negative mining: top (ratio * num_pos) negatives by loss
    neg_loss = jnp.where(neg, per_ce, -1.0)
    k = neg_loss.shape[0]
    sorted_neg = jnp.sort(neg_loss)[::-1]
    n_neg = jnp.minimum(
        (neg_pos_ratio * num_pos).astype(jnp.int32), jnp.sum(neg))
    thresh = sorted_neg[jnp.clip(n_neg - 1, 0, k - 1)]
    neg_sel = neg & (per_ce >= thresh) & (n_neg > 0)
    loss_cls = jnp.sum(per_ce * (pos | neg_sel)) / num_pos

    matched = gt_boxes[jnp.clip(assign.assigned_gt_inds - 1, 0,
                                gt_boxes.shape[0] - 1)]
    # ssd300 config bbox_coder: target_stds=[.1, .1, .2, .2]
    # (configs/_base_/models/ssd300.py:29-30)
    deltas = box_ops.bbox2delta(anchors, matched, stds=SSD_STDS)
    loss_bbox = losses.smooth_l1_loss(
        reg_all, deltas, beta=1.0,
        weight=pos[:, None].astype(jnp.float32), avg_factor=num_pos)
    return SSDLossOut(loss_cls, loss_bbox)


def ssd_decode(level_outs, img_shape, num_classes, nms_pre=1000,
               score_thr=0.02, iou_threshold=0.45, max_per_img=200,
               scale_factor=None) -> nms_ops.DetResult:
    shapes = [(c.shape[-3], c.shape[-2]) for c, _ in level_outs]
    anchors = ssd_anchors(shapes)
    all_b, all_s, all_l = [], [], []
    for (cls, reg), anc in zip(level_outs, anchors):
        probs = jax.nn.softmax(
            cls.reshape(-1, num_classes + 1).astype(jnp.float32))[:, :num_classes]
        deltas = reg.reshape(-1, 4).astype(jnp.float32)
        flat = probs.reshape(-1)
        k = min(nms_pre, flat.shape[0])
        top_s, top_i = jax.lax.top_k(flat, k)
        bi = top_i // num_classes
        decoded = box_ops.delta2bbox(anc[bi], deltas[bi], stds=SSD_STDS,
                                     max_shape=img_shape)
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
    return nms_ops.DetResult(res.boxes, res.scores, labels[res.inds], res.valid)
