"""On-device image preprocessing.

The reference runs Resize/Normalize/Pad (and the low-light Brighten + noise
synthesis) in DataLoader worker processes on CPU
(mmtrack/datasets/pipelines/transforms.py). Here decode happens on host but
all numeric work is pure jnp, fused by XLA into the forward pass prologue —
one HBM round-trip instead of a host pipeline.

Constants mirror the reference's ImageNet ``img_norm_cfg``
(mean [123.675, 116.28, 103.53], std [58.395, 57.12, 57.375], RGB).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize(img: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """[..., H, W, 3] raw-intensity RGB -> normalized float32."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img.astype(jnp.float32) - mean) / std


def brighten(img: jnp.ndarray, target_mean: float = 0.25) -> jnp.ndarray:
    """Low-light amplification: scale so mean intensity ~= target_mean*255,
    never darkening (amp >= 1), matching the reference's ``Brighten``
    transform (transforms.py:374-432)."""
    m = jnp.mean(img.astype(jnp.float32)) / 255.0
    amp = jnp.maximum(target_mean / jnp.maximum(m, 1e-6), 1.0)
    return jnp.clip(img.astype(jnp.float32) * amp, 0.0, 255.0)


def resize_keep_ratio(
    img: np.ndarray, scale: Tuple[int, int] = (1000, 600)
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side 'keep ratio' resize to fit within (max_long, max_short), the
    reference's Resize(img_scale=(1000, 600), keep_ratio=True). Returns
    (resized HWC float32, scale_factor [sx, sy, sx, sy])."""
    h, w = img.shape[:2]
    max_long, max_short = max(scale), min(scale)
    f = min(max_long / max(h, w), max_short / min(h, w))
    new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
    out = np.asarray(
        jax.image.resize(
            jnp.asarray(img, jnp.float32), (new_h, new_w) + img.shape[2:], "bilinear"
        )
    )
    sf = np.array([new_w / w, new_h / h, new_w / w, new_h / h], np.float32)
    return out, sf


def pad_to(img: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Zero-pad [..., H, W, C] bottom/right to the static bucket."""
    h, w = img.shape[-3], img.shape[-2]
    pads = [(0, 0)] * (img.ndim - 3) + [(0, pad_h - h), (0, pad_w - w), (0, 0)]
    return jnp.pad(img, pads)


def prepare_frames(
    frames: np.ndarray,
    pad_h: int,
    pad_w: int,
    scale: Optional[Tuple[int, int]] = None,
    do_brighten: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
    """Full host->device prep for a [T, H, W, 3] uint8/float clip.

    ``scale`` defaults to the pad bucket itself so resized content always
    fits; pass the reference's (1000, 600) explicitly for parity runs with
    a matching bucket.
    Returns (imgs [T, ph, pw, 3] normalized, img_shape [2], scale_factor [4]).
    """
    if scale is None:
        scale = (pad_w, pad_h)
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    resized = []
    sf = None
    for f in frames:
        r, sf = resize_keep_ratio(f, scale)
        resized.append(r)
    stack = jnp.asarray(np.stack(resized))
    if do_brighten is not None:
        stack = brighten(stack, do_brighten)
    imgs = pad_to(normalize(stack), pad_h, pad_w)
    img_shape = jnp.asarray([resized[0].shape[0], resized[0].shape[1]], jnp.float32)
    return imgs, img_shape, sf
