"""Stacked Hourglass backbone (CornerNet/CentripetalNet).

Parity target: mmdetection/mmdet/models/backbones/hourglass.py —
HourglassNet-104: stem (7x7 s2 + residual s2), 2 hourglass modules of depth
5 with per-level channels (256, 256, 384, 384, 384, 512), inter-stage skip
convs, outputs one 256-ch stride-4 feature per stack. BasicBlock residuals
with FrozenBN (resnet.py semantics).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, FrozenBatchNorm


def _conv_bn_relu(x, ch, k, stride, dtype, name):
    x = nn.Conv(ch, (k, k), strides=(stride, stride),
                padding=[((k - 1) // 2,) * 2] * 2, use_bias=False,
                dtype=dtype, name=f"{name}_conv")(x)
    return nn.relu(FrozenBatchNorm(dtype=dtype, name=f"{name}_bn")(x))


class HourglassModule(nn.Module):
    """Recursive encoder-decoder at `depth` levels."""

    depth: int
    channels: Sequence[int]  # per level, len == depth + 1
    blocks: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cur = self.channels[0]
        nxt = self.channels[1]
        # upper branch at current resolution
        up = x
        for j in range(self.blocks):
            up = BasicBlock(planes=cur, downsample=(up.shape[-1] != cur),
                            dtype=self.dtype, name=f"up_{j}")(up)
        # lower branch: downsample -> recurse/bottom -> upsample
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        for j in range(self.blocks):
            low = BasicBlock(planes=nxt, downsample=(low.shape[-1] != nxt),
                             dtype=self.dtype, name=f"low1_{j}")(low)
        if self.depth > 1:
            low = HourglassModule(depth=self.depth - 1,
                                  channels=self.channels[1:],
                                  blocks=self.blocks, dtype=self.dtype,
                                  name="low2")(low)
        else:
            for j in range(self.blocks):
                low = BasicBlock(planes=nxt, downsample=False,
                                 dtype=self.dtype, name=f"low2_{j}")(low)
        for j in range(self.blocks):
            last = j == self.blocks - 1
            low = BasicBlock(planes=cur if last else nxt,
                             downsample=(last and nxt != cur),
                             dtype=self.dtype, name=f"low3_{j}")(low)
        up2 = jax.image.resize(low, up.shape, "nearest")
        return up + up2


class HourglassNet(nn.Module):
    """num_stacks hourglass modules with intermediate supervision taps."""

    num_stacks: int = 2
    depth: int = 5
    channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    feat_channel: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = _conv_bn_relu(x, 128, 7, 2, self.dtype, "stem1")
        x = BasicBlock(planes=256, stride=2, downsample=True,
                       dtype=self.dtype, name="stem2")(x)

        outs = []
        for s in range(self.num_stacks):
            hg = HourglassModule(depth=self.depth, channels=self.channels,
                                 dtype=self.dtype, name=f"hg{s}")(x)
            feat = _conv_bn_relu(hg, self.feat_channel, 3, 1, self.dtype,
                                 f"out{s}")
            outs.append(feat)
            if s < self.num_stacks - 1:
                # inter-stack fusion (hourglass.py forward: conv residuals)
                a = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"remap_x{s}")(x)
                a = FrozenBatchNorm(dtype=self.dtype, name=f"remap_x_bn{s}")(a)
                b = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"remap_f{s}")(feat)
                b = FrozenBatchNorm(dtype=self.dtype, name=f"remap_f_bn{s}")(b)
                x = nn.relu(a + b)
                x = BasicBlock(planes=256, downsample=False, dtype=self.dtype,
                               name=f"inter{s}")(x)
        return tuple(outs)
