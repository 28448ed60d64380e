"""RoIAlign on TPU.

Replaces the reference's native mmcv RoIAlign CUDA kernel (used via
mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:54 with
``output_size=7, sampling_ratio=2, aligned=True``) with an XLA gather
formulation: per-bin regular sub-samples, 4-corner bilinear gathers from the
flattened feature map, processed in fixed-size roi chunks under ``lax.map`` to
bound the gather intermediate (chunk*49*sr^2*4*C) in VMEM-friendly sizes.

Feature maps are NHWC (TPU-native). Batched maps are flattened to [B*H*W, C]
and each roi's samples are clamped *within its own image* before the batch row
offset is applied, so bilinear never bleeds across the image seam.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _interp_weights(coords, size, sampling_ratio):
    """Per-roi separable bilinear+pool weights.

    coords: [n, out, sr] sample positions along one axis (image-local,
    unclamped). Returns [n, out, size] weights A with
    ``pooled[p] = sum_i A[p, i] * line[i]`` — the bilinear taps of all ``sr``
    sub-samples averaged into the output bin (mean pool folded in).
    Out-of-range samples (<-1 or >size) contribute zero, matching the
    reference kernel's oob rule."""
    oob = (coords < -1.0) | (coords > size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    c0 = jnp.floor(c)
    c1 = jnp.minimum(c0 + 1.0, size - 1.0)
    lo = c - c0
    hi = 1.0 - lo
    hi = jnp.where(oob, 0.0, hi)
    lo = jnp.where(oob, 0.0, lo)
    oh0 = jax.nn.one_hot(c0.astype(jnp.int32), size, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(c1.astype(jnp.int32), size, dtype=jnp.float32)
    # [n, out, sr, size] -> mean over sr sub-samples
    w = oh0 * hi[..., None] + oh1 * lo[..., None]
    return jnp.sum(w, axis=2) / sampling_ratio


@functools.partial(
    jax.jit, static_argnames=("out_size", "sampling_ratio", "aligned", "chunk")
)
def roi_align_matmul(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    out_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk: int = 64,
) -> jnp.ndarray:
    """Single-image RoIAlign as two MXU matmuls per roi chunk.

    Bilinear sampling is separable: pooled[p,q,c] = Ay[p,h] Ax[q,w] F[h,w,c]
    with Ay/Ax the per-roi interpolation+pool weight matrices
    (``_interp_weights``). On TPU this beats the 4-corner gather formulation
    by keeping all work on the MXU with zero gathers.

    feat: [H, W, C]; rois: [N, 4]. Returns [N, out, out, C].
    """
    h, w, c = feat.shape
    n = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    sr = sampling_ratio
    sub = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr
    bins = jnp.arange(out_size, dtype=jnp.float32)

    # chunk exactly when possible: n=300 with chunk=64 pads to 5x64=320 and
    # the trailing [:n] slice forces a relayout copy of the whole output
    # (~110 us/step profiled); 5 chunks of 60 need neither
    nchunks = -(-n // chunk)
    if n % nchunks == 0 and (n // nchunks) % 4 == 0:
        chunk = n // nchunks
    pad = (-n) % chunk
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    # The per-chunk interpolation intermediate is this op's entire cost on
    # TPU (pure HBM traffic; the FLOPs are trivial): profiled at ~890 us/step
    # with an f32 [chunk, 7, W=63, C] tmp. Two exact-er-than-needed fixes:
    # contract the LARGER spatial axis (W) first so tmp ranges over H=38, and
    # carry tmp in the caller's feature dtype — the streaming path feeds bf16
    # neck features (so f32 interp adds no information), while f32 callers
    # (the mmcv-golden parity tests) keep full f32 semantics.
    cdt = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    feat_c = feat.astype(cdt)

    def one_chunk(rois_c):
        x1 = rois_c[:, 0] * spatial_scale - offset
        y1 = rois_c[:, 1] * spatial_scale - offset
        x2 = rois_c[:, 2] * spatial_scale - offset
        y2 = rois_c[:, 3] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        # [m, out, sr] sample coords
        ys = y1[:, None, None] + (bins[None, :, None] + sub[None, None, :]) \
            * (roi_h / out_size)[:, None, None]
        xs = x1[:, None, None] + (bins[None, :, None] + sub[None, None, :]) \
            * (roi_w / out_size)[:, None, None]
        ay = _interp_weights(ys, h, sr)  # [m, out, H]
        ax = _interp_weights(xs, w, sr)  # [m, out, W]
        # col interp on the MXU: [m, out, W] x [H, W, C] -> [m, H, out, C]
        # (mhqc order: the second contraction then reads tmp[m] as a natural
        # [H, out*C] matmul operand, no per-chunk transpose)
        tmp = jnp.einsum("mqw,hwc->mhqc", ax.astype(cdt), feat_c,
                         preferred_element_type=jnp.float32).astype(cdt)
        return jnp.einsum("mph,mhqc->mpqc", ay.astype(cdt), tmp,
                          preferred_element_type=jnp.float32).astype(feat.dtype)

    out = jax.lax.map(one_chunk, rois_p.reshape(-1, chunk, 4))
    return out.reshape(-1, out_size, out_size, c)[:n]


@functools.partial(
    jax.jit, static_argnames=("out_size", "sampling_ratio", "aligned", "chunk")
)
def roi_align(
    feats: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    batch_inds: Optional[jnp.ndarray] = None,
    out_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk: int = 64,
) -> jnp.ndarray:
    """RoIAlign (avg pool mode).

    feats: [H, W, C] or [B, H, W, C] feature map(s).
    rois: [N, 4] (x1, y1, x2, y2) in image coordinates.
    batch_inds: [N] int32 image index per roi (required iff feats is 4-D;
      the reference packs this as rois[:, 0]).
    Returns [N, out_size, out_size, C].
    """
    if feats.ndim == 3:
        # single image: the separable-matmul path (MXU, no gathers)
        return roi_align_matmul(
            feats, rois, spatial_scale, out_size=out_size,
            sampling_ratio=sampling_ratio, aligned=aligned, chunk=chunk,
        )
    if feats.shape[0] == 1:
        return roi_align_matmul(
            feats[0], rois, spatial_scale, out_size=out_size,
            sampling_ratio=sampling_ratio, aligned=aligned, chunk=chunk,
        )
    b, h, w, c = feats.shape
    n = rois.shape[0]
    flat = feats.reshape(b * h * w, c)
    offset = 0.5 if aligned else 0.0
    sr = sampling_ratio
    sub = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr  # [sr]
    bins = jnp.arange(out_size, dtype=jnp.float32)

    pad = (-n) % chunk
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    binds_p = jnp.pad(batch_inds.astype(jnp.int32), (0, pad))

    def one_chunk(args):
        rois_c, binds_c = args
        m = rois_c.shape[0]
        x1 = rois_c[:, 0] * spatial_scale - offset
        y1 = rois_c[:, 1] * spatial_scale - offset
        x2 = rois_c[:, 2] * spatial_scale - offset
        y2 = rois_c[:, 3] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size

        # image-local sample grids: [m, out, sr]
        ys = y1[:, None, None] + (bins[None, :, None] + sub[None, None, :]) * bin_h[:, None, None]
        xs = x1[:, None, None] + (bins[None, :, None] + sub[None, None, :]) * bin_w[:, None, None]
        # broadcast to [m, out, out, sr, sr]
        yy = jnp.broadcast_to(ys[:, :, None, :, None], (m, out_size, out_size, sr, sr))
        xx = jnp.broadcast_to(xs[:, None, :, None, :], (m, out_size, out_size, sr, sr))

        oob = (yy < -1.0) | (yy > h) | (xx < -1.0) | (xx > w)
        yyc = jnp.clip(yy, 0.0, h - 1.0)
        xxc = jnp.clip(xx, 0.0, w - 1.0)
        y0 = jnp.floor(yyc)
        x0 = jnp.floor(xxc)
        y1f = jnp.minimum(y0 + 1.0, h - 1.0)
        x1f = jnp.minimum(x0 + 1.0, w - 1.0)
        ly = yyc - y0
        lx = xxc - x0
        hy = 1.0 - ly
        hx = 1.0 - lx

        row_base = (binds_c * (h * w))[:, None, None, None, None]
        y0i = y0.astype(jnp.int32)
        y1i = y1f.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        x1i = x1f.astype(jnp.int32)

        def take(yi, xi):
            return flat[row_base + yi * w + xi]

        val = (
            take(y0i, x0i) * (hy * hx)[..., None]
            + take(y0i, x1i) * (hy * lx)[..., None]
            + take(y1i, x0i) * (ly * hx)[..., None]
            + take(y1i, x1i) * (ly * lx)[..., None]
        )
        val = jnp.where(oob[..., None], 0.0, val)
        return jnp.mean(val, axis=(3, 4))  # avg over sr*sr sub-samples

    chunks = (rois_p.reshape(-1, chunk, 4), binds_p.reshape(-1, chunk))
    out = jax.lax.map(one_chunk, chunks)
    return out.reshape(-1, out_size, out_size, c)[:n]
