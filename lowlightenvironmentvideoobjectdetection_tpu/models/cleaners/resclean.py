"""Frozen clean-branch feature extractors (distillation teachers).

Parity target: mmtracking/mmtrack/models/cleaners/resclean.py:6-37
(ResCleaner / ResRAWCleaner): a plain ResNet run on the clean half of the
(noise, clean) pair whose stage features supervise the detector backbone.
The reference freezes it via ``freeze_module('cleaner')``
(mmtrack/models/vid/base.py:39-52); here the caller wraps its output in
``stop_gradient`` and its params are masked from the optimizer.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..backbones.resnet import ResNet


class ResCleaner(nn.Module):
    """Plain ResNet on clean frames; emits the stages mirrored by the
    detector's feature-consistency loss (cleaner ``out_indices`` mirror the
    detector's, e.g. llvod_l4_darkfarm.py:139)."""

    depth: int = 50
    in_channels: int = 3  # 4 for the RAW variant (ResRAWCleaner)
    out_indices: Sequence[int] = (3,)
    strides: Sequence[int] = (1, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, clean_imgs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        feats = ResNet(
            depth=self.depth,
            in_channels=self.in_channels,
            strides=self.strides,
            dilations=self.dilations,
            out_indices=self.out_indices,
            frozen_stages=-1,
            dtype=self.dtype,
            name="resnet",
        )(clean_imgs)
        # teacher is frozen: no gradient flows into the cleaner
        return tuple(lax.stop_gradient(f) for f in feats)
