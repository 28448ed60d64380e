"""RegNet backbone (design-space network with grouped bottlenecks).

Parity target: mmdetection/mmdet/models/backbones/regnet.py — widths/depths
generated from the (w0, wa, wm, depth, group_w) quantized-linear rule, then
grouped bottleneck stages (expansion 1). The arch table below carries the
same named models mmdet ships configs for.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resnet import FrozenBatchNorm

REGNET_ARCH = {
    # name: (w0, wa, wm, depth, group_w)
    "regnetx_400mf": (24, 24.48, 2.54, 22, 16),
    "regnetx_800mf": (56, 35.73, 2.28, 16, 16),
    "regnetx_1.6gf": (80, 34.01, 2.25, 18, 24),
    "regnetx_3.2gf": (88, 26.31, 2.25, 25, 48),
    "regnetx_4.0gf": (96, 38.65, 2.43, 23, 40),
    "regnetx_6.4gf": (184, 60.83, 2.07, 17, 56),
    "regnetx_8.0gf": (80, 49.56, 2.88, 23, 120),
    "regnetx_12gf": (168, 73.36, 2.37, 19, 112),
}


def generate_regnet(w0, wa, wm, depth, q=8):
    """Quantized linear width rule (regnet.py generate_regnet)."""
    ws_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / q) * q
    num_stages = len(np.unique(ws))
    ws = ws.astype(int).tolist()
    stage_widths, stage_depths = [], []
    for w in sorted(set(ws)):
        stage_widths.append(w)
        stage_depths.append(ws.count(w))
    return stage_widths, stage_depths, num_stages


def adjust_ws_gs(widths, group_w):
    """Ensure widths divisible by their group width (adjust_ws_gs_comp)."""
    gs = [min(group_w, w) for w in widths]
    ws = [int(round(w / g) * g) for w, g in zip(widths, gs)]
    return ws, gs


class RegBottleneck(nn.Module):
    width: int
    stride: int = 1
    group_width: int = 16
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        groups = max(self.width // self.group_width, 1)
        out = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(out))
        out = nn.Conv(self.width, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1)] * 2, feature_group_count=groups,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(out))
        out = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class RegNet(nn.Module):
    arch: str = "regnetx_3.2gf"
    stem_channels: int = 32
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        w0, wa, wm, depth, group_w = REGNET_ARCH[self.arch]
        widths, depths, _ = generate_regnet(w0, wa, wm, depth)
        widths, group_ws = adjust_ws_gs(widths, group_w)

        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2),
                    padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x))
        if self.frozen_stages >= 0:
            x = lax.stop_gradient(x)

        outs = {}
        for i, (w, d, g) in enumerate(zip(widths, depths, group_ws)):
            for j in range(d):
                first = j == 0
                needs_ds = first and (x.shape[-1] != w or True)
                x = RegBottleneck(
                    width=w, stride=2 if first else 1, group_width=g,
                    downsample=needs_ds, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}")(x)
            if self.frozen_stages >= i + 1:
                x = lax.stop_gradient(x)
            outs[i] = x
        return tuple(outs[i] for i in self.out_indices)
