"""Feature Pyramid Network neck.

Parity target: mmdetection/mmdet/models/necks/fpn.py:12-190 — lateral 1x1
convs, top-down nearest-neighbor upsample + add, 3x3 output convs, optional
extra levels from stride-2 convs on the last input/output
(``add_extra_convs='on_input'`` for RetinaNet) or maxpool (Faster R-CNN FPN).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    add_extra_convs: str = "on_output"  # 'on_input' | 'on_output' | 'maxpool'
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        """inputs: per-level [.., H_i, W_i, C_i], highest resolution first."""
        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x.astype(self.dtype))
            for i, x in enumerate(inputs)
        ]
        # top-down pathway
        for i in range(n_in - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:-3] + laterals[i - 1].shape[-3:-1]
                + (self.out_channels,),
                "nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"fpn_conv{i}")(laterals[i])
            for i in range(n_in)
        ]

        # extra levels
        if self.num_outs > n_in:
            if self.add_extra_convs == "maxpool":
                for _ in range(self.num_outs - n_in):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                src = inputs[-1].astype(self.dtype) \
                    if self.add_extra_convs == "on_input" else outs[-1]
                for k in range(self.num_outs - n_in):
                    if k > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f"extra_conv{k}",
                    )(src)
                    outs.append(src)
        return tuple(outs)
