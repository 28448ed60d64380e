"""RoIAlign as a Pallas TPU kernel.

The XLA separable-matmul formulation (ops/roi_align.py:51) is numerically
exact but materializes the row-interpolated intermediate
[chunk, 7, W, C] (f32, ~59 MB per 64-roi chunk at DC5 resolution) in HBM
between the two einsums — ~0.6 GB of traffic per frame, the roi extractor's
entire cost. The whole DC5 neck map is only ~2.5 MB in bf16, so this kernel
keeps the map AND the intermediate in VMEM: HBM traffic drops to one read of
the feature map + the [N, 7, 7, C] output.

Per grid program (a chunk of M rois):
  tmp  = Ay_chunk @ F          one MXU matmul  [M*7, H] @ [H, W*C]
  out' = per-roi Ax contraction over W         (batched small matmuls)

Ay/Ax are the per-roi bilinear interpolation+pool weight matrices, computed
in plain XLA outside the kernel (they are tiny). Semantics (aligned=True,
sampling_ratio, oob rules) are inherited from ``_interp_weights`` and tested
against the gather reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _interp_weights


def _kernel(ay_ref, ax_ref, feat_ref, o_ref):
    # ay: [M, P, H]; ax: [M, P, W]; feat: [H, W*C]; o: [M, P, P, C]
    m, p, h = ay_ref.shape
    w = ax_ref.shape[2]
    c = o_ref.shape[3]
    ay = ay_ref[:].reshape(m * p, h)
    # row interpolation for the whole chunk in one matmul: [M*P, W*C]
    tmp = jax.lax.dot_general(
        ay, feat_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(m, p, w, c)

    # static unroll over the (small) chunk: dynamic value-indexing is not
    # lowerable on TPU pallas, and m is a compile-time constant anyway
    for i in range(m):
        # [P(q), W] x [W, P(p)*C] -> [q, p*c] contraction over W
        t_i = tmp[i].transpose(1, 0, 2).reshape(w, p * c)
        o = jax.lax.dot_general(
            ax_ref[i], t_i, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [q, p*c]
        o_ref[i] = o.reshape(p, p, c).transpose(1, 0, 2).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "sampling_ratio", "aligned", "chunk",
                     "interpret"),
)
def roi_align_pallas(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    out_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """feat: [H, W, C] single image; rois: [N, 4]. Returns [N, out, out, C]
    (f32). Exact same math as ``roi_align_matmul``."""
    h, w, c = feat.shape
    n = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    sr = sampling_ratio
    sub = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr
    bins = jnp.arange(out_size, dtype=jnp.float32)

    pad = (-n) % chunk
    rois_p = jnp.pad(rois.astype(jnp.float32), ((0, pad), (0, 0)))
    x1 = rois_p[:, 0] * spatial_scale - offset
    y1 = rois_p[:, 1] * spatial_scale - offset
    x2 = rois_p[:, 2] * spatial_scale - offset
    y2 = rois_p[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    ys = y1[:, None, None] + (bins[None, :, None] + sub[None, None, :]) \
        * (roi_h / out_size)[:, None, None]
    xs = x1[:, None, None] + (bins[None, :, None] + sub[None, None, :]) \
        * (roi_w / out_size)[:, None, None]
    ay = _interp_weights(ys, h, sr)  # [Np, P, H] f32
    ax = _interp_weights(xs, w, sr)  # [Np, P, W] f32

    grid = (rois_p.shape[0] // chunk,)
    kw = {}
    if not interpret:
        # "arbitrary" (sequential) grid semantics let Mosaic keep the
        # constant-index feature-map block resident across grid steps
        # instead of re-fetching it per program (measured: the refetch made
        # the kernel ~5% slower end-to-end than the XLA path in round 2)
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, out_size, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, out_size, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, out_size, out_size, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (rois_p.shape[0], out_size, out_size, c), jnp.float32),
        interpret=interpret,
        **kw,
    )(ay, ax, feat.reshape(h, w * c))
    return out[:n]
