"""Res2Net backbone: hierarchical multi-scale bottlenecks.

Parity target: mmdetection/mmdet/models/backbones/res2net.py (Bottle2neck):
the 3x3 conv is split into ``scales`` sequential branches; branch i convolves
(split_i + out_{i-1}), giving multi-receptive-field features inside one
block. Stage layout and FrozenBN semantics follow resnet.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .resnet import ARCH_SETTINGS, FrozenBatchNorm


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int((self.planes * self.base_width / 64.0) // 1)
        mid = width * self.scales
        out = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)

        splits = [out[..., i * width:(i + 1) * width]
                  for i in range(self.scales)]
        outs = []
        prev = None
        # 'stage' mode when downsampling: every branch sees its raw split
        stage_mode = self.downsample or self.stride != 1
        for i in range(self.scales - 1):
            inp = splits[i] if (prev is None or stage_mode) else splits[i] + prev
            y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                        padding=[(self.dilation, self.dilation)] * 2,
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype,
                        name=f"conv2_{i}")(inp)
            y = nn.relu(FrozenBatchNorm(dtype=self.dtype, name=f"bn2_{i}")(y))
            outs.append(y)
            prev = y
        last = splits[-1]
        if stage_mode:
            last = nn.avg_pool(last, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=[(1, 1)] * 2)
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.avg_pool(x, (self.stride, self.stride),
                                   strides=(self.stride, self.stride)) \
                if self.stride != 1 else x
            identity = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(identity)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Res2Net(nn.Module):
    """Res2Net-50/101 (26w4s default, as mmdet's
    res2net50_v1b default config)."""

    depth: int = 50
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    scales: int = 4
    base_width: int = 26
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        # v1b deep stem: three 3x3 convs
        for i, (c, s) in enumerate([(32, 2), (32, 1), (64, 1)]):
            x = nn.Conv(c, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, name=f"stem{i}")(x)
            x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name=f"stem_bn{i}")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = lax.stop_gradient(x)

        outs = {}
        for i in range(self.num_stages):
            planes = self.base_channels * (2 ** i)
            stride = self.strides[i]
            for j in range(stage_blocks[i]):
                first = j == 0
                needs_ds = first and (stride != 1 or x.shape[-1] != planes * 4)
                x = Bottle2neck(
                    planes=planes, stride=stride if first else 1,
                    dilation=self.dilations[i], downsample=needs_ds,
                    scales=self.scales, base_width=self.base_width,
                    dtype=self.dtype, name=f"layer{i + 1}_{j}")(x)
            if self.frozen_stages >= i + 1:
                x = lax.stop_gradient(x)
            outs[i] = x
        return tuple(outs[i] for i in self.out_indices)
