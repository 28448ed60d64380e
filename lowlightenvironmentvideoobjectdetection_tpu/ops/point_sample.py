"""Point sampling and masked convolution.

TPU replacements for the last two mmcv ops on the SURVEY §2.9 inventory:

- ``point_sample`` (mmcv/ops/point_sample.py, used by PointRend-style heads):
  bilinear sampling of a feature map at arbitrary normalized points — a thin
  wrapper over ops/grid_sample.
- ``masked_conv2d`` (mmcv MaskedConv2d, used by guided-anchoring feature
  adaption): on GPU it gathers masked pixels to save compute; on TPU a dense
  conv + mask multiply is strictly faster (no gather, stays on the MXU), and
  is numerically identical on the masked-in positions, which are the only
  ones the consumer reads.
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample


def point_sample(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """feat: [H, W, C]; points: [P, 2] normalized (x, y) in [0, 1]
    (mmcv convention). Returns [P, C]."""
    grid = points[None] * 2.0 - 1.0  # -> [-1, 1], grid_sample convention
    out = grid_sample(feat, grid)  # [1, P, C]
    return out[0]


def masked_conv2d(apply_conv, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """apply_conv: a dense conv callable [H, W, Cin] -> [H, W, Cout];
    mask: [H, W] bool/float of positions to keep. Dense-compute-then-mask:
    the TPU-idiomatic form of mmcv's sparse MaskedConv2d."""
    out = apply_conv(x)
    return out * mask[..., None].astype(out.dtype)
