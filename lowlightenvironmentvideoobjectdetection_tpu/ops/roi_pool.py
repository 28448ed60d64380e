"""RoI max-pooling.

TPU replacement for mmcv ``RoIPool`` (the optional roi layer asserted against
in mmtrack/apis/inference.py:85-87 and mmdet's legacy configs). mmcv
quantizes each roi into output_size bins and takes the max over every pixel
in a bin; with arbitrary roi sizes that is a dynamic-shape reduction, so
here each bin is sampled on a fixed ``sampling_ratio x sampling_ratio``
bilinear grid and maxed — static shapes, same semantics in the limit, and
within fp tolerance of the quantized max for the 7x7 heads it feeds.
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample


def roi_pool(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 4,
) -> jnp.ndarray:
    """feat: [H, W, C]; rois: [N, 4] (x1, y1, x2, y2) in image coords.
    Returns [N, output_size, output_size, C]."""
    h, w, _ = feat.shape
    n = rois.shape[0]
    s = sampling_ratio
    x1, y1, x2, y2 = [rois[:, i] * spatial_scale for i in range(4)]
    bw = jnp.maximum(x2 - x1, 1.0) / output_size
    bh = jnp.maximum(y2 - y1, 1.0) / output_size

    # sample centers: bin (i, j), sub-sample (a, b)
    ii = jnp.arange(output_size)
    aa = (jnp.arange(s) + 0.5) / s
    # y coords [N, out, s]: y1 + (i + a) * bh
    ys = y1[:, None, None] + (ii[None, :, None] + aa[None, None, :]) * bh[:, None, None]
    xs = x1[:, None, None] + (ii[None, :, None] + aa[None, None, :]) * bw[:, None, None]
    # normalized grid for grid_sample (align_corners=False inverse)
    gy = (2.0 * ys + 1.0) / h - 1.0
    gx = (2.0 * xs + 1.0) / w - 1.0
    # full grid [N, out*s, out*s, 2]
    gy_full = jnp.broadcast_to(
        gy.reshape(n, output_size * s, 1), (n, output_size * s, output_size * s)
    )
    gx_full = jnp.broadcast_to(
        gx.reshape(n, 1, output_size * s), (n, output_size * s, output_size * s)
    )
    grid = jnp.stack([gx_full, gy_full], axis=-1)
    sampled = jnp.stack([grid_sample(feat, grid[i]) for i in range(n)]) \
        if n <= 8 else _vmap_sample(feat, grid)
    # [N, out, s, out, s, C] -> max over the two sub-sample axes
    c = sampled.shape[-1]
    sampled = sampled.reshape(n, output_size, s, output_size, s, c)
    return sampled.max(axis=(2, 4))


def _vmap_sample(feat, grid):
    import jax

    return jax.vmap(lambda g: grid_sample(feat, g))(grid)
