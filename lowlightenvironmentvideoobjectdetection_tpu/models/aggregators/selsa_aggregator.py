"""SELSA cross-frame attention aggregator.

Parity target: mmtracking/mmtrack/models/aggregators/selsa_aggregator.py:8-73
— multi-head (16) dot-product attention from key-frame RoI features [N, C] to
reference RoI features [M, C], expressed here as einsums that XLA maps onto
the MXU in one fusion. An optional ``ref_mask`` masks padded reference rois
(the static-shape replacement for the reference's dynamic roi counts).

For the streaming inference path the projections are split out
(``project_q`` / ``project_kv`` / ``attend_cached``): the reference-roi K/V
are computed ONCE per reference frame and cached in the video memo, and the
attention itself runs as a fused Pallas kernel on TPU
(ops/fused_attention.py) so the [heads, N, M] score tensor never touches HBM.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SelsaAggregator(nn.Module):
    in_channels: int = 1024
    num_attention_blocks: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        c = self.in_channels
        self.fc_embed = nn.Dense(c, dtype=self.dtype, name="fc_embed")
        self.ref_fc_embed = nn.Dense(c, dtype=self.dtype, name="ref_fc_embed")
        self.ref_fc = nn.Dense(c, dtype=self.dtype, name="ref_fc")
        self.fc = nn.Dense(c, dtype=self.dtype, name="fc")

    def _split(self, t: jnp.ndarray) -> jnp.ndarray:
        return t.reshape(-1, self.num_attention_blocks,
                         self.in_channels // self.num_attention_blocks)

    def project_q(self, x: jnp.ndarray) -> jnp.ndarray:
        """[N, C] -> [N, nb, hd] query embedding."""
        return self._split(self.fc_embed(x))

    def project_kv(self, ref_x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[M, C] -> ([M, C], [M, C]) key/value projections (flat, cacheable)."""
        return self.ref_fc_embed(ref_x), self.ref_fc(ref_x)

    def project_kv_hm(self, ref_x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[M, C] -> ([nb, M, hd], [nb, M, hd]) head-major cached K/V — the
        layout the fused attention kernel consumes directly, and the form the
        streaming memo stores so no per-frame transpose of the reference
        cache is needed."""
        k = self._split(self.ref_fc_embed(ref_x)).transpose(1, 0, 2)
        v = self._split(self.ref_fc(ref_x)).transpose(1, 0, 2)
        return k, v

    def attend_cached(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        ref_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """q: [N, nb, hd]; k, v: [nb, M, hd] head-major cached projections
        (project_kv_hm / the streaming memo layout); ref_mask: [M].
        Fused Pallas attention on TPU, einsum reference elsewhere."""
        from ...ops.fused_attention import (
            selsa_attention_reference_hm,
            selsa_fused_attention_hm,
        )

        import os

        m = k.shape[1]
        bias = (jnp.where(ref_mask, 0.0, -1e30).astype(jnp.float32)
                if ref_mask is not None else jnp.zeros((m,), jnp.float32))
        # LLVOD_FUSED_ATTN=0 forces the plain-einsum path on TPU (A/B knob)
        if (jax.default_backend() == "tpu"
                and os.environ.get("LLVOD_FUSED_ATTN", "1") != "0"):
            agg = selsa_fused_attention_hm(q, k, v, bias)
        else:
            agg = selsa_attention_reference_hm(q, k, v, bias)
        agg = agg.astype(self.dtype).reshape(-1, self.in_channels)
        return self.fc(agg)

    def attend_cached2(
        self,
        q: jnp.ndarray,
        k_memo: jnp.ndarray,
        v_memo: jnp.ndarray,
        k_cur: jnp.ndarray,
        v_cur: jnp.ndarray,
        memo_mask: jnp.ndarray,
        cur_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Two-slab streaming attention: memo K/V [nb, M1, hd] plus this
        frame's own K/V [nb, M2, hd], joint softmax — the concatenated
        [nb, M1+M2, hd] K/V never exists (no HBM concat round trip). Same
        math as ``attend_cached(q, concat(k), concat(v), concat(mask))``."""
        import os

        from ...ops.fused_attention import (
            selsa_attention_reference_hm,
            selsa_fused_attention_2slab_hm,
        )

        b1 = jnp.where(memo_mask, 0.0, -1e30).astype(jnp.float32)
        b2 = jnp.where(cur_mask, 0.0, -1e30).astype(jnp.float32)
        if (jax.default_backend() == "tpu"
                and os.environ.get("LLVOD_FUSED_ATTN", "1") != "0"):
            agg = selsa_fused_attention_2slab_hm(
                q, k_memo, v_memo, k_cur.astype(k_memo.dtype),
                v_cur.astype(v_memo.dtype), b1, b2)
        else:
            k = jnp.concatenate(
                [k_memo, k_cur.astype(k_memo.dtype)], axis=1)
            v = jnp.concatenate(
                [v_memo, v_cur.astype(v_memo.dtype)], axis=1)
            agg = selsa_attention_reference_hm(
                q, k, v, jnp.concatenate([b1, b2]))
        agg = agg.astype(self.dtype).reshape(-1, self.in_channels)
        return self.fc(agg)

    def __call__(
        self,
        x: jnp.ndarray,
        ref_x: jnp.ndarray,
        ref_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [N, C]; ref_x: [M, C]; ref_mask: [M] bool (True = real roi).
        Returns aggregated [N, C] (to be residual-added by the caller)."""
        c = self.in_channels
        hd = c // self.num_attention_blocks

        x_embed = self._split(self.fc_embed(x))
        ref_embed = self._split(self.ref_fc_embed(ref_x))
        # [nb, N, M]
        weights = jnp.einsum("nbc,mbc->bnm", x_embed, ref_embed) / (hd ** 0.5)
        if ref_mask is not None:
            weights = jnp.where(ref_mask[None, None, :], weights, -1e30)
        weights = nn.softmax(weights, axis=-1)

        ref_new = self._split(self.ref_fc(ref_x))
        agg = jnp.einsum("bnm,mbc->nbc", weights, ref_new).reshape(-1, c)
        return self.fc(agg)
