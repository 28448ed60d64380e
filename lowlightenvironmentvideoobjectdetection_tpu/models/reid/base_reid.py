"""ReID embedder for DeepSORT/Tracktor.

Parity target: mmtracking/mmtrack/models/reid/ (BaseReID = mmcls
ImageClassifier with ResNet-50 + GlobalAveragePooling + LinearReIDHead
producing an embedding; linear_reid_head.py:10, gap.py:7, fc_module.py:6).
Embeddings feed the host-side cosine/Mahalanobis association.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ResNet


class LinearReIDHead(nn.Module):
    """fc stack -> embedding (+ optional classification logits at train)."""

    num_fcs: int = 1
    in_channels: int = 2048
    fc_channels: int = 1024
    out_channels: int = 128
    num_classes: int = 0  # >0 enables the train-time id-classification branch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name=f"fc{i}")(x))
        embed = nn.Dense(self.out_channels, dtype=self.dtype, name="fc_out")(x)
        if train and self.num_classes > 0:
            logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(
                embed
            )
            return embed, logits
        return embed


class BaseReID(nn.Module):
    depth: int = 50
    out_channels: int = 128
    num_classes: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, crops: jnp.ndarray, train: bool = False):
        """crops: [N, H, W, 3] normalized person crops -> [N, out_channels]."""
        feats = ResNet(
            depth=self.depth, out_indices=(3,), frozen_stages=-1,
            dtype=self.dtype, name="backbone",
        )(crops)
        pooled = jnp.mean(feats[0], axis=(1, 2)).astype(jnp.float32)  # GAP
        return LinearReIDHead(
            in_channels=pooled.shape[-1], out_channels=self.out_channels,
            num_classes=self.num_classes, name="head",
        )(pooled, train=train)
