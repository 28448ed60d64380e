"""Fused SELSA cross-frame attention (Pallas TPU kernel).

The streaming SELSA head attends 300 key rois over ~4500 cached reference
rois with 16 heads (selsa_aggregator.py:47-73). As plain XLA einsums the
[16, 300, 4500] f32 score tensor is materialized in HBM several times
(scores, mask, softmax, AV read) — ~0.5 GB of traffic per frame in a
pipeline that the roofline analysis (tools/bench_streams.py) shows is
HBM-bandwidth-bound. This kernel keeps the whole per-head score matrix in
VMEM (300x4608 f32 = 5.5 MB): HBM traffic drops to one read of Q/K/V and one
write of the output.

Grid = one program per attention head. Per program:
  S = (Q_h K_h^T) / sqrt(hd) + bias   (MXU matmul, f32 accumulate)
  P = softmax(S, axis=-1)             (VPU, in VMEM)
  O = P V_h                           (MXU matmul)

Inference-only (the training path keeps the differentiable einsum form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # q: [1, N, hd]; k/v: [1, M, hd]; bias: [1, M]; o: [1, N, hd]
    # scale folded into q pre-dot (scaling [N, M] f32 costs a full VPU pass)
    q = q_ref[0] * (1.0 / (q_ref.shape[-1] ** 0.5))
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, M]
    s = s + bias_ref[:]  # [1, M] broadcasts over rows
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def selsa_fused_attention_hm(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-major variant: q: [N, nb, hd]; k, v: [nb, M, hd] — the kernel's
    native operand layout. The streaming memo stores K/V in this form
    (selsa.py VideoState) so no per-frame [M, nb, hd] -> [nb, M, hd]
    transpose of the ~4500-roi cache is ever materialized (profiled at
    ~0.3 ms/frame as XLA copies before this change). bias: [M] additive f32
    (0 live, -1e30 padded). Returns [N, nb, hd] f32."""
    n, nb, hd = q.shape
    m = k.shape[1]
    npad = _round_up(n, 8)
    # sublane (8) alignment suffices — Mosaic masks tile tails; rounding to
    # 128 cost an explicit HBM pad of the whole K/V set per call
    mpad = _round_up(m, 8)

    qt = jnp.pad(q, ((0, npad - n), (0, 0), (0, 0))).transpose(1, 0, 2)
    kt = jnp.pad(k, ((0, 0), (0, mpad - m), (0, 0)))
    vt = jnp.pad(v, ((0, 0), (0, mpad - m), (0, 0)))
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, mpad - m),
                     constant_values=-1e30).reshape(1, mpad)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, npad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad, hd), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, npad, hd), jnp.float32),
        interpret=interpret,
    )(qt, kt, vt, bias_p)
    return out.transpose(1, 0, 2)[:n]


def _attn2_kernel(q_ref, k1_ref, v1_ref, k2_ref, v2_ref, b1_ref, b2_ref,
                  o_ref):
    # q: [1, N, hd]; k1/v1: [1, M1, hd] (memo slab); k2/v2: [1, M2, hd]
    # (current-frame slab); b1: [1, M1]; b2: [1, M2]; o: [1, N, hd].
    # Joint softmax over the concatenation of both slabs WITHOUT the
    # concatenated K/V ever existing (in HBM or VMEM).
    # 1/sqrt(hd) is folded into q on the [N, hd] operand BEFORE the dot —
    # scaling the [N, M] f32 score matrix instead costs a full extra VPU
    # pass over ~1.4M elements per head (~1.5 us x 16 heads x 2 layers).
    q = q_ref[0] * (1.0 / (q_ref.shape[-1] ** 0.5))
    k1, v1 = k1_ref[0], v1_ref[0]
    k2, v2 = k2_ref[0], v2_ref[0]
    s1 = jax.lax.dot_general(
        q, k1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:]
    s2 = jax.lax.dot_general(
        q, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:]
    m = jnp.maximum(s1.max(axis=-1), s2.max(axis=-1))  # [N]
    e1 = jnp.exp(s1 - m[:, None])
    e2 = jnp.exp(s2 - m[:, None])
    den = e1.sum(axis=-1) + e2.sum(axis=-1)
    o = (jax.lax.dot_general(
            e1.astype(v1.dtype), v1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
         + jax.lax.dot_general(
            e2.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_ref[0] = (o / den[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def selsa_fused_attention_2slab_hm(
    q: jnp.ndarray,
    k_memo: jnp.ndarray,
    v_memo: jnp.ndarray,
    k_cur: jnp.ndarray,
    v_cur: jnp.ndarray,
    bias_memo: jnp.ndarray,
    bias_cur: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two-slab head-major attention: softmax over
    ``concat([k_memo, k_cur], axis=1)`` computed WITHOUT materializing the
    concatenation. The streaming head attends over the ~4200-roi reference
    memo plus this frame's 300 rois; the XLA concat of memo++current K/V
    costs 4 x [nb, 4608, hd] HBM round trips per frame (~115 us measured) —
    here each slab streams into the kernel as its own operand.

    q: [N, nb, hd]; k/v_memo: [nb, M1, hd]; k/v_cur: [nb, M2, hd];
    bias_*: [M1] / [M2] additive f32. Returns [N, nb, hd] f32, identical
    math to ``selsa_fused_attention_hm(q, concat(k), concat(v), concat(b))``.
    """
    n, nb, hd = q.shape
    m1, m2 = k_memo.shape[1], k_cur.shape[1]
    npad = _round_up(n, 8)
    # slab lengths only need sublane (8) alignment — Mosaic masks the tile
    # tails internally. Rounding to 128 cost an explicit HBM pad of the
    # whole 4200-roi memo (2 x ~26 us/frame in the xprof trace).
    m1pad = _round_up(m1, 8)
    m2pad = _round_up(m2, 8)

    qt = jnp.pad(q, ((0, npad - n), (0, 0), (0, 0))).transpose(1, 0, 2)
    k1 = jnp.pad(k_memo, ((0, 0), (0, m1pad - m1), (0, 0)))
    v1 = jnp.pad(v_memo, ((0, 0), (0, m1pad - m1), (0, 0)))
    k2 = jnp.pad(k_cur, ((0, 0), (0, m2pad - m2), (0, 0)))
    v2 = jnp.pad(v_cur, ((0, 0), (0, m2pad - m2), (0, 0)))
    b1 = jnp.pad(bias_memo.astype(jnp.float32), (0, m1pad - m1),
                 constant_values=-1e30).reshape(1, m1pad)
    b2 = jnp.pad(bias_cur.astype(jnp.float32), (0, m2pad - m2),
                 constant_values=-1e30).reshape(1, m2pad)

    out = pl.pallas_call(
        _attn2_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, npad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m1pad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m1pad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2pad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2pad, hd), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m1pad), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2pad), lambda h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad, hd), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, npad, hd), jnp.float32),
        interpret=interpret,
    )(qt, k1, v1, k2, v2, b1, b2)
    return out.transpose(1, 0, 2)[:n]


def selsa_fused_attention(q, k, v, bias, interpret: bool = False):
    """Roi-major compatibility wrapper: q: [N, nb, hd]; k, v: [M, nb, hd]."""
    return selsa_fused_attention_hm(
        q, k.transpose(1, 0, 2), v.transpose(1, 0, 2), bias,
        interpret=interpret)


def selsa_attention_reference_hm(q, k, v, bias):
    """Plain-XLA reference, head-major k/v: [nb, M, hd] (CPU and tests)."""
    hd = q.shape[-1]
    s = jnp.einsum("nbc,bmc->bnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (hd ** 0.5)
    s = s + bias.astype(jnp.float32)[None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmc->nbc", p, v.astype(jnp.float32))


def selsa_attention_reference(q, k, v, bias):
    """Plain-XLA reference of the same math, roi-major k/v: [M, nb, hd]."""
    return selsa_attention_reference_hm(
        q, k.transpose(1, 0, 2), v.transpose(1, 0, 2), bias)
