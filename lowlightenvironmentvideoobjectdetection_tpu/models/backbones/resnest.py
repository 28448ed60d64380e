"""ResNeSt backbone: split-attention bottlenecks.

Parity target: mmdetection/mmdet/models/backbones/resnest.py — the 3x3 conv
becomes a Split-Attention conv (radix 2): grouped conv to width*radix
channels, per-radix global pooling, a 2-layer channel-attention MLP, and an
r-softmax over the radix splits; deep stem + avg-pool downsampling as the
v1d trunk.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .resnet import ARCH_SETTINGS, FrozenBatchNorm


class SplAtConv(nn.Module):
    channels: int
    radix: int = 2
    reduction: int = 4
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        r, c = self.radix, self.channels
        out = nn.Conv(c * r, (3, 3), strides=(self.stride,) * 2,
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation,) * 2,
                      feature_group_count=r, use_bias=False,
                      dtype=self.dtype, name="conv")(x)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn0")(out))
        h, w = out.shape[-3], out.shape[-2]
        splits = out.reshape(out.shape[:-1] + (r, c))
        gap = jnp.sum(splits, axis=-2)  # sum over radix
        gap = jnp.mean(gap, axis=(-3, -2), keepdims=True)  # [..., 1, 1, c]
        inter = max(c * r // self.reduction, 32)
        att = nn.Conv(inter, (1, 1), dtype=self.dtype, name="fc1")(gap)
        att = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(att))
        att = nn.Conv(c * r, (1, 1), dtype=self.dtype, name="fc2")(att)
        att = att.reshape(att.shape[:-3] + (1, 1, r, c))
        att = nn.softmax(att.astype(jnp.float32), axis=-2).astype(self.dtype)
        return jnp.sum(splits * att, axis=-2)


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    radix: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(out))
        # v1d: stride via avg-pool before the SplAt conv
        if self.stride > 1:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=[(1, 1)] * 2)
        out = SplAtConv(channels=self.planes, radix=self.radix,
                        dilation=self.dilation, dtype=self.dtype,
                        name="conv2")(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            identity = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(identity)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNeSt(nn.Module):
    depth: int = 50
    base_channels: int = 64
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    radix: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        for i, (c, s) in enumerate([(32, 2), (32, 1), (64, 1)]):
            x = nn.Conv(c, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, name=f"stem{i}")(x)
            x = nn.relu(FrozenBatchNorm(dtype=self.dtype,
                                        name=f"stem_bn{i}")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = lax.stop_gradient(x)
        outs = {}
        for i in range(4):
            planes = self.base_channels * (2 ** i)
            stride = self.strides[i]
            for j in range(stage_blocks[i]):
                first = j == 0
                needs = first and (stride != 1 or x.shape[-1] != planes * 4)
                x = ResNeStBottleneck(
                    planes=planes, stride=stride if first else 1,
                    dilation=self.dilations[i], downsample=needs,
                    radix=self.radix, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}")(x)
            if self.frozen_stages >= i + 1:
                x = lax.stop_gradient(x)
            outs[i] = x
        return tuple(outs[i] for i in self.out_indices)
