"""Corner pooling (mmcv.ops.CornerPool) as XLA cumulative maxima.

The CUDA kernel scans each row/column keeping a running max; on TPU that is
exactly ``jax.lax.cummax`` along the scan axis (reversed for top/left) —
a single fused VPU pass, no custom kernel needed.

Modes (mmcv semantics, NHWC here):
- 'top':    out[i, j] = max_{i' >= i} x[i', j]
- 'bottom': out[i, j] = max_{i' <= i} x[i', j]
- 'left':   out[i, j] = max_{j' >= j} x[i, j']
- 'right':  out[i, j] = max_{j' <= j} x[i, j']
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def corner_pool(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """x: [..., H, W, C]."""
    if mode == "top":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, -3), axis=x.ndim - 3), -3)
    if mode == "bottom":
        return jax.lax.cummax(x, axis=x.ndim - 3)
    if mode == "left":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, -2), axis=x.ndim - 2), -2)
    if mode == "right":
        return jax.lax.cummax(x, axis=x.ndim - 2)
    raise ValueError(mode)


def tl_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Top-left corner pooling = top + left."""
    return corner_pool(x, "top") + corner_pool(x, "left")


def br_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Bottom-right corner pooling = bottom + right."""
    return corner_pool(x, "bottom") + corner_pool(x, "right")
