"""Bilinear grid sampling and flow warping.

TPU replacement for ATen ``F.grid_sample`` as used by the reference's
``flow_warp_feats`` (mmtracking/mmtrack/core/motion/flow.py:4-41) — the hot op
of DFF/FGFA. Pure XLA gathers; NHWC layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding and align_corners=False semantics.

    feat: [H, W, C]; grid: [Ho, Wo, 2] normalized coords in [-1, 1], last dim
    (x, y) as torch. Returns [Ho, Wo, C].
    """
    h, w, c = feat.shape
    # unnormalize, align_corners=False: x_pix = ((x + 1) * W - 1) / 2
    x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    lx = x - x0
    ly = y - y0

    def take(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = feat.reshape(h * w, c)[yc * w + xc]
        return jnp.where(inb[..., None], vals, 0.0)

    out = (
        take(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + take(y0, x1) * ((1 - ly) * lx)[..., None]
        + take(y1, x0) * (ly * (1 - lx))[..., None]
        + take(y1, x1) * (ly * lx)[..., None]
    )
    return out


def flow_warp_feats(feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp [H, W, C] features by an optical flow field.

    flow: [Hf, Wf, 2] pixel-displacement field at (possibly) another
    resolution; it is bilinearly resized to (H, W) and magnitude-rescaled by
    the resolution ratio, then used to displace an identity sampling grid —
    the same pipeline as the reference's flow_warp_feats (flow.py:18-40).
    """
    h, w, _ = feat.shape
    fh, fw, _ = flow.shape
    # resize flow to feature resolution (bilinear at pixel centers,
    # align_corners=False) and rescale displacement magnitudes
    scale_x = w / fw
    scale_y = h / fh
    nx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 - 1
    ny = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 - 1
    gx, gy = jnp.meshgrid(nx, ny)
    flow_r = grid_sample(flow, jnp.stack([gx, gy], axis=-1))
    flow_r = flow_r * jnp.asarray([scale_x, scale_y], flow.dtype)

    # displaced sampling grid over the feature map (pixel -> normalized with
    # the same align_corners=False mapping grid_sample inverts)
    base_x = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    base_y = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    sx = base_x + flow_r[..., 0]
    sy = base_y + flow_r[..., 1]
    nxx = (sx + 0.5) / w * 2 - 1
    nyy = (sy + 0.5) / h * 2 - 1
    return grid_sample(feat, jnp.stack([nxx, nyy], axis=-1))
