"""Temporal RoI Align.

Parity target: mmtracking/mmtrack/models/roi_heads/roi_extractors/
temporal_roi_align.py:9-207 — Most-Similar RoI Align (cosine similarity of
RoI pixels against reference feature-map pixels, top-k softmax gather) plus
multi-head temporal attention aggregation over [key, refs].

All einsum/top_k: the similarity matrix [roi_n*49, img_n*H*W] is one MXU
matmul; the per-image python loop of the reference becomes a vmap.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalRoIAlign(nn.Module):
    out_channels: int = 512
    num_most_similar_points: int = 2
    num_temporal_attention_blocks: int = 4
    dtype: Any = jnp.float32

    def most_similar_roi_align(self, roi_feats, ref_feats):
        """roi_feats: [roi_n, 7, 7, C]; ref_feats: [img_n, H, W, C].
        Returns [img_n, roi_n, 7, 7, C]."""
        roi_n, rh, rw, c = roi_feats.shape
        img_n, h, w, _ = ref_feats.shape
        k = self.num_most_similar_points

        roi_e = roi_feats / jnp.maximum(
            jnp.linalg.norm(roi_feats, axis=-1, keepdims=True), 1e-6
        )
        ref_e = ref_feats / jnp.maximum(
            jnp.linalg.norm(ref_feats, axis=-1, keepdims=True), 1e-6
        )
        q = roi_e.reshape(roi_n * rh * rw, c)
        kmat = ref_e.reshape(img_n, h * w, c)
        ref_flat = ref_feats.reshape(img_n, h * w, c)

        # Stream one image at a time (lax.map, sequential): the similarity
        # matrix is [Q, H*W] per step instead of [img_n, Q, H*W] all at once
        # (~2 GB at 14 refs x 300 rois x full-res DC5 maps). Each step is one
        # big MXU matmul, so sequencing costs nothing.
        def per_img(args):
            kmat_i, ref_i = args
            sim = jnp.einsum("qc,pc->qp", q, kmat_i,
                             preferred_element_type=jnp.float32)
            vals, idx = jax.lax.top_k(sim, k)  # [Q, k]
            weights = jax.nn.softmax(vals, axis=-1)
            gathered = ref_i[idx]  # [Q, k, C]
            return jnp.sum(gathered * weights[..., None], axis=1)  # [Q, C]

        out = jax.lax.map(per_img, (kmat, ref_flat))
        return out.reshape(img_n, roi_n, rh, rw, c)

    @nn.compact
    def __call__(
        self,
        roi_feats: jnp.ndarray,
        ref_feats: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """roi_feats: [roi_n, 7, 7, C] (from plain RoIAlign); ref_feats:
        [img_n, H, W, C] last-level reference maps or None."""
        if ref_feats is None:
            return roi_feats

        ref_roi = self.most_similar_roi_align(
            roi_feats.astype(jnp.float32), ref_feats.astype(jnp.float32)
        )
        # [1+img_n, roi_n, 7, 7, C]
        x = jnp.concatenate([roi_feats[None].astype(jnp.float32), ref_roi], axis=0)

        nb = self.num_temporal_attention_blocks
        if nb > 0:
            img_n, roi_n, rh, rw, c = x.shape
            embed = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="embed_network")
            x_embed = embed(x.reshape(img_n * roi_n, rh, rw, c))
            x_embed = x_embed.reshape(img_n, roi_n, rh, rw, nb, c // nb)
            target = x_embed[:1]
            ada = jnp.sum(x_embed * target, axis=-1, keepdims=True) / (
                (c / nb) ** 0.5
            )  # [img_n, roi_n, 7, 7, nb, 1]
            ada = jnp.broadcast_to(ada, x_embed.shape).reshape(
                img_n, roi_n, rh, rw, c
            )
            ada = jax.nn.softmax(ada, axis=0)
            return jnp.sum(x * ada, axis=0)
        return jnp.mean(x, axis=0)
