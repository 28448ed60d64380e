"""CARAFE: Content-Aware ReAssembly of FEatures (upsampling op).

Parity target: mmcv.ops.CARAFEPack as used by the reference's CARAFE-FPN
(mmdetection/mmdet/models/necks/fpn_carafe.py). The CUDA kernel becomes an
XLA formulation:
  1. kernel prediction: 1x1 channel compressor -> content encoder conv ->
     pixel-shuffle to the upsampled grid -> softmax over the k_up^2 window;
  2. reassembly: each upsampled pixel is a weighted sum of the k_up x k_up
     source-pixel neighborhood — an extract_patches + einsum, which XLA maps
     to gathers + an MXU contraction.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _extract_patches(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: [H, W, C] -> [H, W, k*k, C] zero-padded neighborhoods."""
    h, w, c = x.shape
    patches = lax.conv_general_dilated_patches(
        x[None], (k, k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]  # [H, W, C*k*k] with channel-major ordering [c, kh, kw]
    patches = patches.reshape(h, w, c, k * k)
    return jnp.moveaxis(patches, -1, -2)  # [H, W, k*k, C]


def carafe(x: jnp.ndarray, kernels: jnp.ndarray, k_up: int = 5,
           scale: int = 2) -> jnp.ndarray:
    """x: [H, W, C]; kernels: [H*scale, W*scale, k_up*k_up] (softmaxed).
    Returns [H*scale, W*scale, C]."""
    h, w, c = x.shape
    patches = _extract_patches(x, k_up)  # [H, W, K, C]
    # map each output pixel to its source pixel's patch
    oy = jnp.arange(h * scale) // scale
    ox = jnp.arange(w * scale) // scale
    src = patches[oy][:, ox]  # [Ho, Wo, K, C]
    return jnp.einsum("hwk,hwkc->hwc", kernels, src,
                      preferred_element_type=jnp.float32)


class CARAFEPack(nn.Module):
    """Kernel-prediction + reassembly module (mmcv CARAFEPack)."""

    channels: int = 256
    scale: int = 2
    k_up: int = 5
    k_enc: int = 3
    compressed: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [H, W, C] -> [H*scale, W*scale, C]."""
        h, w, _ = x.shape
        s, ku = self.scale, self.k_up
        comp = nn.Conv(self.compressed, (1, 1), dtype=self.dtype,
                       name="channel_compressor")(x)
        enc = nn.Conv(ku * ku * s * s, (self.k_enc, self.k_enc),
                      padding=[((self.k_enc - 1) // 2,) * 2] * 2,
                      dtype=self.dtype, name="content_encoder")(comp)
        # pixel shuffle to [H*s, W*s, ku*ku]
        enc = enc.reshape(h, w, s, s, ku * ku)
        enc = jnp.transpose(enc, (0, 2, 1, 3, 4)).reshape(
            h * s, w * s, ku * ku)
        kernels = jax.nn.softmax(enc.astype(jnp.float32), axis=-1)
        return carafe(x.astype(jnp.float32), kernels, ku, s).astype(x.dtype)
