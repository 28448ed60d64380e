"""SELSA cross-frame attention aggregator.

Parity target: mmtracking/mmtrack/models/aggregators/selsa_aggregator.py:8-73
— multi-head (16) dot-product attention from key-frame RoI features [N, C] to
reference RoI features [M, C], expressed here as einsums that XLA maps onto
the MXU in one fusion. An optional ``ref_mask`` masks padded reference rois
(the static-shape replacement for the reference's dynamic roi counts).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class SelsaAggregator(nn.Module):
    in_channels: int = 1024
    num_attention_blocks: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ref_x: jnp.ndarray,
        ref_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [N, C]; ref_x: [M, C]; ref_mask: [M] bool (True = real roi).
        Returns aggregated [N, C] (to be residual-added by the caller)."""
        c = self.in_channels
        nb = self.num_attention_blocks
        hd = c // nb
        dense = lambda name: nn.Dense(c, dtype=self.dtype, name=name)

        x_embed = dense("fc_embed")(x).reshape(-1, nb, hd)
        ref_embed = dense("ref_fc_embed")(ref_x).reshape(-1, nb, hd)
        # [nb, N, M]
        weights = jnp.einsum("nbc,mbc->bnm", x_embed, ref_embed) / (hd ** 0.5)
        if ref_mask is not None:
            weights = jnp.where(ref_mask[None, None, :], weights, -1e30)
        weights = nn.softmax(weights, axis=-1)

        ref_new = dense("ref_fc")(ref_x).reshape(-1, nb, hd)
        agg = jnp.einsum("bnm,mbc->nbc", weights, ref_new).reshape(-1, c)
        return dense("fc")(agg)
