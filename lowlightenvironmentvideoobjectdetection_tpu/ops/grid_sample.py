"""Bilinear grid sampling and flow warping.

TPU replacement for ATen ``F.grid_sample`` as used by the reference's
``flow_warp_feats`` (mmtracking/mmtrack/core/motion/flow.py:4-41) — the hot op
of DFF/FGFA. Pure XLA gathers; NHWC layout.

``flow_warp_feats`` defaults to *exact reference semantics* (torch-golden
tested): the flow field is resized with torch ``interpolate``'s
border-clamped bilinear using the single width-derived scale factor
(flow.py:17-20), and the warp normalizes pixel coords as ``x / W * 2 - 1``
but samples with ``align_corners=True`` + border padding (flow.py:32-40) —
an upstream normalization mismatch that effectively samples at
``x * (W-1) / W``. Reference-trained FlowNet weights were learned against
that mapping, so parity is the default; ``centered=True`` opts into the
self-consistent pixel-center mapping (zero flow == identity).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample, matching torch ``F.grid_sample`` conventions.

    feat: [H, W, C]; grid: [..., 2] normalized coords in [-1, 1], last dim
    (x, y) as torch. Returns [..., C].

    align_corners=False unnormalizes ``x_pix = ((x + 1) * W - 1) / 2``;
    align_corners=True uses ``x_pix = (x + 1) / 2 * (W - 1)``. padding_mode
    'zeros' fades out-of-map corner taps to zero; 'border' clips the sample
    coordinate into the map first (torch ``clip_coordinates``), so edge
    values extend outward.
    """
    h, w, c = feat.shape
    if align_corners:
        x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
        y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    else:
        x = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
        y = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    lx = x - x0
    ly = y - y0

    flat = feat.reshape(h * w, c)

    if padding_mode == "border":

        def take(yi, xi):
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return flat[yc * w + xc]

    else:

        def take(yi, xi):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            vals = flat[yc * w + xc]
            return jnp.where(inb[..., None], vals, 0.0)

    out = (
        take(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + take(y0, x1) * ((1 - ly) * lx)[..., None]
        + take(y1, x0) * (ly * (1 - lx))[..., None]
        + take(y1, x1) * (ly * lx)[..., None]
    )
    return out


def _resize_bilinear_border(img: jnp.ndarray, out_h: int, out_w: int,
                            scale: float) -> jnp.ndarray:
    """torch ``interpolate(scale_factor=scale, mode='bilinear',
    align_corners=False)``: src = (dst + 0.5) / scale - 0.5 with
    border-clamped corner taps. img: [H, W, C] -> [out_h, out_w, C]."""
    sx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / scale - 0.5
    sy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / scale - 0.5
    gx, gy = jnp.meshgrid(sx, sy)
    fh, fw, _ = img.shape
    # express pixel coords in the align_corners=False normalized convention
    nx = (2.0 * gx + 1.0) / fw - 1.0
    ny = (2.0 * gy + 1.0) / fh - 1.0
    return grid_sample(img, jnp.stack([nx, ny], axis=-1),
                       align_corners=False, padding_mode="border")


def flow_warp_feats(
    feat: jnp.ndarray, flow: jnp.ndarray, centered: bool = False
) -> jnp.ndarray:
    """Warp [H, W, C] features by a [Hf, Wf, 2] pixel-displacement flow.

    Default = bit-parity with the reference pipeline (flow.py:17-40):
    width-derived scalar resize factor, border-clamped bilinear flow resize,
    then ``grid_sample(align_corners=True, padding_mode='border')`` over the
    reference's ``(x + flow) / W * 2 - 1`` grid. ``centered=True`` instead
    uses the self-consistent pixel-center mapping with zero padding (zero
    flow == exact identity).
    """
    h, w, _ = feat.shape
    fh, fw, _ = flow.shape

    if centered:
        scale_x = w / fw
        scale_y = h / fh
        nx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 - 1
        ny = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 - 1
        gx, gy = jnp.meshgrid(nx, ny)
        flow_r = grid_sample(flow, jnp.stack([gx, gy], axis=-1))
        flow_r = flow_r * jnp.asarray([scale_x, scale_y], flow.dtype)

        base_x = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
        base_y = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
        sx = base_x + flow_r[..., 0]
        sy = base_y + flow_r[..., 1]
        nxx = (sx + 0.5) / w * 2 - 1
        nyy = (sy + 0.5) / h * 2 - 1
        return grid_sample(feat, jnp.stack([nxx, nyy], axis=-1))

    # reference parity path
    scale = w / fw  # float(x.shape[-1]) / flow.shape[-1], both axes
    flow_r = _resize_bilinear_border(flow, h, w, scale) * scale

    base_x = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    base_y = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    nxx = (base_x + flow_r[..., 0]) / w * 2 - 1
    nyy = (base_y + flow_r[..., 1]) / h * 2 - 1
    return grid_sample(
        feat,
        jnp.stack([nxx, nyy], axis=-1),
        align_corners=True,
        padding_mode="border",
    )
