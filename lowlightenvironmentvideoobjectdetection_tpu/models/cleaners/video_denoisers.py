"""Image-space video denoisers: FastDVDnet and a single U-Net baseline.

Parity targets:
- FastDVDnet: mmtracking/mmtrack/models/cleaners/FastDVDnet.py:120-148 —
  two-level cascade of U-Net denoising blocks over 5-frame windows: three
  DenBlocks on (0,1,2), (1,2,3), (2,3,4) share weights, their outputs feed a
  second-stage DenBlock with the center frame.
- Unet: mmtrack/models/cleaners/Unet.py:120-140 — single U-Net image
  denoiser baseline.

These feed SelsaFastDVDnetDetect (selsa_fastdvd_darkfarm.py): denoise first,
then standard SELSA detection on the denoised frames.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _cbr(x, ch, dtype, name, stride=1):
    x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=[(1, 1)] * 2,
                use_bias=False, dtype=dtype, name=name)(x)
    return nn.relu(x)


class DenBlock(nn.Module):
    """U-Net denoising block over a triplet of frames (FastDVDnet.py DenBlock):
    encoder at 1x/2x/4x, decoder with skip additions, residual to the center
    frame."""

    in_frames: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames: [H, W, 3*in_frames] concat -> denoised center [H, W, 3]."""
        d = self.dtype
        center = frames[..., 3 * (self.in_frames // 2): 3 * (self.in_frames // 2) + 3]
        x0 = _cbr(frames.astype(d), 32, d, "inc1")
        x0 = _cbr(x0, 32, d, "inc2")
        x1 = _cbr(x0, 64, d, "down1a", stride=2)
        x1 = _cbr(x1, 64, d, "down1b")
        x2 = _cbr(x1, 128, d, "down2a", stride=2)
        x2 = _cbr(x2, 128, d, "down2b")
        # inputs are padded to /32 so the 2x ups align exactly
        u2 = nn.ConvTranspose(64, (2, 2), strides=(2, 2), dtype=d, name="up2")(x2)
        x1 = _cbr(x1 + u2[: x1.shape[0], : x1.shape[1]], 64, d, "dec1")
        u1 = nn.ConvTranspose(32, (2, 2), strides=(2, 2), dtype=d, name="up1")(x1)
        x0 = _cbr(x0 + u1[: x0.shape[0], : x0.shape[1]], 32, d, "dec0")
        out = nn.Conv(3, (3, 3), padding=[(1, 1)] * 2, dtype=d, name="outc")(x0)
        return center + out.astype(jnp.float32)


class FastDVDnet(nn.Module):
    """5-frame window -> denoised center frame."""

    dtype: Any = jnp.float32

    def setup(self):
        self.temp1 = DenBlock(in_frames=3, dtype=self.dtype, name="temp1")
        self.temp2 = DenBlock(in_frames=3, dtype=self.dtype, name="temp2")

    def __call__(self, window: jnp.ndarray) -> jnp.ndarray:
        """window: [H, W, 15] (5 frames concat channel-wise)."""
        f = [window[..., 3 * i: 3 * i + 3] for i in range(5)]
        # stage 1: shared-weight block over the three triplets
        t0 = self.temp1(jnp.concatenate(f[0:3], axis=-1))
        t1 = self.temp1(jnp.concatenate(f[1:4], axis=-1))
        t2 = self.temp1(jnp.concatenate(f[2:5], axis=-1))
        return self.temp2(jnp.concatenate([t0, t1, t2], axis=-1))


class Unet(nn.Module):
    """Single-image U-Net denoiser baseline."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: [H, W, 3] -> denoised [H, W, 3] (residual)."""
        d = self.dtype
        x0 = _cbr(img.astype(d), 32, d, "e0")
        x1 = _cbr(x0, 64, d, "e1", stride=2)
        x2 = _cbr(x1, 128, d, "e2", stride=2)
        x3 = _cbr(x2, 256, d, "e3", stride=2)
        u3 = nn.ConvTranspose(128, (2, 2), strides=(2, 2), dtype=d, name="u3")(x3)
        x2 = _cbr(x2 + u3[: x2.shape[0], : x2.shape[1]], 128, d, "d2")
        u2 = nn.ConvTranspose(64, (2, 2), strides=(2, 2), dtype=d, name="u2")(x2)
        x1 = _cbr(x1 + u2[: x1.shape[0], : x1.shape[1]], 64, d, "d1")
        u1 = nn.ConvTranspose(32, (2, 2), strides=(2, 2), dtype=d, name="u1")(x1)
        x0 = _cbr(x0 + u1[: x0.shape[0], : x0.shape[1]], 32, d, "d0")
        out = nn.Conv(3, (3, 3), padding=[(1, 1)] * 2, dtype=d, name="out")(x0)
        return img + out.astype(jnp.float32)


def fastdvd_denoise_clip(model: FastDVDnet, params, frames: jnp.ndarray):
    """frames: [T, H, W, 3] -> denoised [T, H, W, 3], each frame from its
    edge-replicated 5-frame window (selsa_fastdvd_darkfarm.py:162-171)."""
    t = frames.shape[0]
    idx = jnp.arange(t)

    def one(i):
        win_idx = jnp.clip(jnp.arange(-2, 3) + i, 0, t - 1)
        win = frames[win_idx]  # [5, H, W, 3]
        stacked = jnp.concatenate([win[j] for j in range(5)], axis=-1)
        return model.apply(params, stacked)

    return jax.lax.map(one, idx)
