"""ChannelMapper neck (reference: mmdetection/mmdet/models/necks/channel_mapper.py:8).

One 3x3 conv per input level mapping to a common channel count — the neck the
DC5 VID detectors use (2048 -> 512, kernel 3). No norm/act in the reference
config. NHWC, bfloat16-friendly.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ChannelMapper(nn.Module):
    out_channels: int = 512
    kernel_size: int = 3
    num_levels: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == self.num_levels
        p = self.kernel_size // 2
        outs = []
        for i, x in enumerate(inputs):
            outs.append(
                nn.Conv(
                    self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=[(p, p)] * 2,
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(x.astype(self.dtype))
            )
        return tuple(outs)
