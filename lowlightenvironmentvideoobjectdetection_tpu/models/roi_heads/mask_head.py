"""FCN mask head and mask targets for Mask R-CNN.

Parity target: mmdetection/mmdet/models/roi_heads/mask_heads/fcn_mask_head.py
— 4 stacked 3x3 convs (256), 2x deconv, 1x1 to per-class 28x28 mask logits;
BCE on the matched class channel over positive rois
(mask_target: gt instance mask cropped to the roi and resized to 28x28 —
here that crop+resize IS our RoIAlign applied to the mask image).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import roi_align


class FCNMaskHead(nn.Module):
    num_classes: int = 80
    conv_channels: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """roi_feats: [N, 14, 14, C] -> mask logits [N, 28, 28, num_classes]."""
        x = roi_feats.astype(self.dtype)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_logits")(x).astype(jnp.float32)


def mask_targets(gt_masks: jnp.ndarray, matched_gt_idx: jnp.ndarray,
                 rois: jnp.ndarray, mask_size: int = 28) -> jnp.ndarray:
    """Crop each roi's matched gt instance mask and resize to mask_size.

    gt_masks: [G, H, W] float binary masks (image coords); matched_gt_idx:
    [N] index into G per roi; rois: [N, 4]. Returns [N, S, S] targets.
    The crop+resize is RoIAlign applied per-roi to its own gt mask (the
    reference uses cv2 crop+resize on the host; on TPU this stays on-device).
    """
    sel = gt_masks[matched_gt_idx]  # [N, H, W]
    out = roi_align(
        sel[..., None], rois, spatial_scale=1.0,
        batch_inds=jnp.arange(rois.shape[0], dtype=jnp.int32),
        out_size=mask_size, sampling_ratio=2,
    )
    return (out[..., 0] >= 0.5).astype(jnp.float32)


def mask_iou_targets(pred_bin: jnp.ndarray, m_tgts: jnp.ndarray,
                     gt_masks: jnp.ndarray, matched_gt_idx: jnp.ndarray,
                     rois: jnp.ndarray) -> jnp.ndarray:
    """MaskIoU regression target (maskiou_head.py:101-175 semantics).

    Target = IoU of the binarized predicted mask (inside its box) against
    the WHOLE gt instance: the part of the instance outside the box counts
    in the union. The full-instance area enters in mask-grid units through
    the in-box/full-instance area ratio, exactly like the reference's
    ``_get_area_ratio`` (BitmapMasks.crop int-cast, boundary-clipped,
    >=1px slicing) + ``gt_full_areas = mask_targets.sum / ratio``.

    pred_bin / m_tgts: [N, S, S] binary maps; gt_masks: [G, H, W] binary;
    matched_gt_idx: [N]; rois: [N, 4]. Returns [N] IoU targets.
    """
    _, h, w = gt_masks.shape
    gm = gt_masks[matched_gt_idx]  # [N, H, W]
    full_area = jnp.sum(gm, axis=(1, 2))

    # BitmapMasks.crop: int-cast coords clipped to the map, slice width/
    # height at least 1 px -> region [x1, x1 + max(x2 - x1, 1))
    x1 = jnp.clip(jnp.floor(rois[:, 0]), 0, w)
    y1 = jnp.clip(jnp.floor(rois[:, 1]), 0, h)
    x2 = jnp.clip(jnp.floor(rois[:, 2]), 0, w)
    y2 = jnp.clip(jnp.floor(rois[:, 3]), 0, h)
    wd = jnp.maximum(x2 - x1, 1.0)
    ht = jnp.maximum(y2 - y1, 1.0)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    inside = (
        (xs >= x1[:, None, None]) & (xs < (x1 + wd)[:, None, None])
        & (ys >= y1[:, None, None]) & (ys < (y1 + ht)[:, None, None])
    )
    in_area = jnp.sum(gm * inside, axis=(1, 2))
    ratio = in_area / (full_area + 1e-7)

    gt_full = jnp.sum(m_tgts, axis=(1, 2)) / (ratio + 1e-7)
    overlap = jnp.sum(pred_bin * m_tgts, axis=(1, 2))
    pred_area = jnp.sum(pred_bin, axis=(1, 2))
    denom = pred_area + gt_full - overlap
    return overlap / jnp.maximum(denom, 1e-7)


def mask_loss(mask_logits: jnp.ndarray, targets: jnp.ndarray,
              labels: jnp.ndarray, is_pos: jnp.ndarray) -> jnp.ndarray:
    """BCE on the matched class channel over positive rois
    (fcn_mask_head.py loss)."""
    n, s, _, c = mask_logits.shape
    cls_idx = jnp.clip(labels, 0, c - 1)
    per_roi = jnp.take_along_axis(
        mask_logits, cls_idx[:, None, None, None], axis=-1
    )[..., 0]  # [N, S, S]
    bce = jnp.maximum(per_roi, 0) - per_roi * targets + jnp.log1p(
        jnp.exp(-jnp.abs(per_roi)))
    w = is_pos.astype(jnp.float32)[:, None, None]
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w) * s * s, 1.0)


def paste_masks(mask_probs: jnp.ndarray, boxes: jnp.ndarray,
                img_h: int, img_w: int, thr: float = 0.5) -> jnp.ndarray:
    """[N, S, S] sigmoided masks + [N, 4] boxes -> full-image binary masks
    [N, img_h, img_w] (test-time paste, fcn_mask_head get_seg_masks)."""
    n, s, _ = mask_probs.shape
    ys = jnp.arange(img_h, dtype=jnp.float32)
    xs = jnp.arange(img_w, dtype=jnp.float32)

    def one(m, b):
        x1, y1, x2, y2 = b
        w = jnp.maximum(x2 - x1, 1e-3)
        h = jnp.maximum(y2 - y1, 1e-3)
        gy = (ys - y1) / h * s - 0.5
        gx = (xs - x1) / w * s - 0.5
        gyc = jnp.clip(gy, 0, s - 1)
        gxc = jnp.clip(gx, 0, s - 1)
        y0 = jnp.floor(gyc).astype(jnp.int32)
        x0 = jnp.floor(gxc).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, s - 1)
        x1i = jnp.minimum(x0 + 1, s - 1)
        ly = gyc - y0
        lx = gxc - x0
        v = (m[y0][:, x0] * ((1 - ly)[:, None] * (1 - lx)[None, :])
             + m[y0][:, x1i] * ((1 - ly)[:, None] * lx[None, :])
             + m[y1i][:, x0] * (ly[:, None] * (1 - lx)[None, :])
             + m[y1i][:, x1i] * (ly[:, None] * lx[None, :]))
        inside = ((ys[:, None] >= y1) & (ys[:, None] <= y2)
                  & (xs[None, :] >= x1) & (xs[None, :] <= x2))
        return (v >= thr) & inside

    return jax.vmap(one)(mask_probs, boxes)
