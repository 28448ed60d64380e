"""HRNet backbone: parallel multi-resolution branches with fusion.

Parity target: mmdetection/mmdet/models/backbones/hrnet.py — 4 stages; stage
k runs k parallel branches at strides 4..32; after each module, every branch
is fused with every other via (strided 3x3 downsample chains / bilinear
upsample + 1x1). Arch table = hrnetv2_w32 (the mmdet config family's
default). BasicBlock branches, Bottleneck stage 1, FrozenBN as resnet.py.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .resnet import BasicBlock, Bottleneck, FrozenBatchNorm

HRNET_W32 = dict(
    stage2=dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                num_channels=(32, 64)),
    stage3=dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                num_channels=(32, 64, 128)),
    stage4=dict(num_modules=3, num_branches=4, num_blocks=(4, 4, 4, 4),
                num_channels=(32, 64, 128, 256)),
)

HRNET_W18 = dict(
    stage2=dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                num_channels=(18, 36)),
    stage3=dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                num_channels=(18, 36, 72)),
    stage4=dict(num_modules=3, num_branches=4, num_blocks=(4, 4, 4, 4),
                num_channels=(18, 36, 72, 144)),
)

HRNET_ARCH = {"hrnetv2_w18": HRNET_W18, "hrnetv2_w32": HRNET_W32}


def _upsample_to(x, ref):
    return jax.image.resize(x, ref.shape[:-1] + (x.shape[-1],), "nearest")


class HRModule(nn.Module):
    """num_branches parallel BasicBlock chains + full pairwise fusion."""

    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        feats = []
        for b in range(self.num_branches):
            x = xs[b]
            for j in range(self.num_blocks[b]):
                needs = x.shape[-1] != self.num_channels[b]
                x = BasicBlock(planes=self.num_channels[b], downsample=needs,
                               dtype=self.dtype, name=f"branch{b}_block{j}")(x)
            feats.append(x)

        fused = []
        for i in range(self.num_branches):
            acc = feats[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                y = feats[j]
                if j > i:  # upsample lower-res branch j to i, 1x1 conv
                    y = nn.Conv(self.num_channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"fuse_{j}to{i}")(y)
                    y = FrozenBatchNorm(dtype=self.dtype,
                                        name=f"fuse_bn_{j}to{i}")(y)
                    y = _upsample_to(y, feats[i])
                else:  # downsample chain of strided 3x3s
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = self.num_channels[i] if last else y.shape[-1]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    dtype=self.dtype,
                                    name=f"fuse_{j}to{i}_{s}")(y)
                        y = FrozenBatchNorm(dtype=self.dtype,
                                            name=f"fuse_bn_{j}to{i}_{s}")(y)
                        if not last:
                            y = nn.relu(y)
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    arch: str = "hrnetv2_w32"
    frozen_stages: int = -1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        cfg = HRNET_ARCH[self.arch]
        x = x.astype(self.dtype)
        for i in range(2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name=f"bn{i + 1}")(x))
        # stage 1: 4 Bottlenecks at 64 planes (out 256)
        for j in range(4):
            x = Bottleneck(planes=64, downsample=(j == 0), dtype=self.dtype,
                           name=f"layer1_{j}")(x)
        if self.frozen_stages >= 1:
            x = lax.stop_gradient(x)

        # transitions + stages
        xs = [x]
        for si, key in enumerate(("stage2", "stage3", "stage4")):
            scfg = cfg[key]
            nb = scfg["num_branches"]
            chans = scfg["num_channels"]
            # transition: match channels / add a new lower branch
            new_xs = []
            for b in range(nb):
                if b < len(xs):
                    y = xs[b]
                    if y.shape[-1] != chans[b]:
                        y = nn.Conv(chans[b], (3, 3), padding=[(1, 1)] * 2,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"{key}_trans{b}")(y)
                        y = nn.relu(FrozenBatchNorm(
                            dtype=self.dtype, name=f"{key}_trans_bn{b}")(y))
                else:
                    y = nn.Conv(chans[b], (3, 3), strides=(2, 2),
                                padding=[(1, 1)] * 2, use_bias=False,
                                dtype=self.dtype, name=f"{key}_trans{b}")(xs[-1])
                    y = nn.relu(FrozenBatchNorm(
                        dtype=self.dtype, name=f"{key}_trans_bn{b}")(y))
                new_xs.append(y)
            xs = new_xs
            for m in range(scfg["num_modules"]):
                xs = HRModule(num_branches=nb, num_blocks=scfg["num_blocks"],
                              num_channels=chans, dtype=self.dtype,
                              name=f"{key}_module{m}")(xs)
            if self.frozen_stages >= si + 2:
                xs = [lax.stop_gradient(y) for y in xs]
        return tuple(xs)
