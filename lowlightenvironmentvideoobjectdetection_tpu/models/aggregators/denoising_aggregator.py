"""Feature-space denoising aggregators (RDB + deformable temporal attention).

Parity targets:
- DenseLayer / RDB: mmtracking/mmtrack/models/aggregators/
  denoising2_aggregator.py:10-68 (dense concat growth + 1x1 local fusion,
  residual).
- ModulatedDCNPack: :71-114 — offsets/masks generated from a *different*
  feature than the deformed input.
- TemporalAttentionFusion: :117-154 — per reference frame: offset conv on
  [x, x_ref] concat -> DCNv2 align -> correlation embedding -> softmax over
  the frame axis -> weighted sum.
- DenoisingAggregator (single stage): denoising_aggregator.py:158-200.
- Denoising2Aggergator [sic]: denoising2_aggregator.py:158-244 — per backbone
  stage conv1(+downsampled previous stage concat) -> RDB -> TAF -> residual;
  returns denoised stage features and neck features with the last-stage
  fusion added.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.deform_conv import (  # noqa: F401 — alt forms kept for A/B
    modulated_deform_conv,
    modulated_deform_conv_fused,
    modulated_deform_conv_windowed,
)


class DenseLayer(nn.Module):
    growth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(
            nn.Conv(self.growth, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv")(x)
        )
        return jnp.concatenate([x, out], axis=-1)


class RDB(nn.Module):
    in_channels: int
    channel_growth: int = 64
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_layers):
            h = DenseLayer(self.channel_growth, dtype=self.dtype, name=f"dense{i}")(h)
        fused = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name="lff")(h)
        return x + fused


class ModulatedDCNPack(nn.Module):
    """DCNv2 whose offsets/masks come from ``extra_feat``. The offset conv is
    zero-initialized as the reference (init_offset), so training starts from
    a plain conv."""

    out_channels: int
    deform_groups: int = 8
    dtype: Any = jnp.float32
    # 'windowed' (gather-free — the on-chip fast path) or 'scan' (exact
    # unbounded-offset gather form; also ~3x cheaper to COMPILE on XLA-CPU,
    # used by the multi-chip dryrun)
    dcn_impl: str = "windowed"
    # windowed-form offset clamp; window work scales as (2r+3)^2
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, x, extra_feat):
        """x: [T, H, W, C]; extra_feat: [T, H, W, C'] -> [T, H, W, out]."""
        import math

        k = 3
        g = math.gcd(self.deform_groups, x.shape[-1])
        off_ch = g * 3 * k * k
        om = nn.Conv(
            off_ch, (k, k), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(extra_feat)
        om = om.reshape(*om.shape[:-1], g, 3, k * k)
        o1 = om[..., 0, :]
        o2 = om[..., 1, :]
        mask = jax.nn.sigmoid(om[..., 2, :])
        offset = jnp.stack([o1, o2], axis=-2)  # [..., G, 2, K]

        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (k, k, x.shape[-1], self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        def one(xi, oi, mi):
            # windowed gather-FREE formulation (round-5 MFU work): TPU
            # gathers serialize — the gather forms measured 222-741 ms
            # fwd(+bwd) at the TAF stage-1 shape while the windowed-hat
            # form runs on the VPU/MXU. Offsets here come from the
            # zero-initialized conv_offset and stay well inside the
            # radius-3 window throughout training; bilinear-exact within
            # it (tests/test_dcn_golden.py::TestWindowedVariant).
            o2 = oi.reshape(*oi.shape[:2], -1)
            m2 = mi.reshape(*mi.shape[:2], -1)
            if self.dcn_impl == "scan":
                return modulated_deform_conv(
                    xi, o2, m2, weight, bias, kernel_size=k,
                    deform_groups=g)
            return modulated_deform_conv_windowed(
                xi, o2, m2, weight, bias, kernel_size=k, deform_groups=g,
                radius=self.dcn_radius,
            )

        return jax.vmap(one)(x, offset, mask)


class TemporalAttentionFusion(nn.Module):
    channels: int
    mid_channels: int
    emb_nums: int = 3
    dtype: Any = jnp.float32
    dcn_impl: str = "windowed"
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [T, H, W, C] frames of one clip -> fused [T, H, W, C]."""
        t = x.shape[0]
        x = nn.relu(
            nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="conv1")(x)
        )
        offset_conv = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1)] * 2,
                              dtype=self.dtype, name="offset_conv")
        dcn = ModulatedDCNPack(self.mid_channels, deform_groups=8,
                               dcn_impl=self.dcn_impl,
                               dcn_radius=self.dcn_radius,
                               dtype=self.dtype, name="dcn_pack")
        emb_convs = [
            nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"emb_conv{i}")
            for i in range(self.emb_nums)
        ]
        conv2 = nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name="conv2")

        def fuse_one(x_ref):
            """x_ref: [H, W, C] -> fused frame [H, W, C_mid]."""
            ref = jnp.broadcast_to(x_ref[None], x.shape)
            x_set = offset_conv(jnp.concatenate([x, ref], axis=-1))
            x_dcn = dcn(x, x_set)
            h = x_dcn * ref
            for c in emb_convs:
                h = c(h)
            w = jax.nn.softmax(h, axis=0)
            return jnp.sum(w * x, axis=0)

        # sequential (python-unrolled) fusion over reference frames: vmap
        # materializes all T fusions at once, which at stage-0 resolution
        # exhausts HBM during full-res training; the loop keeps peak /T
        fused = jnp.stack([fuse_one(x[i]) for i in range(t)])
        return nn.relu(conv2(fused))


class DenoisingAggregator(nn.Module):
    """Single-stage variant (denoising_aggregator.py:158-200): conv -> RDB
    chain -> TAF -> conv, residual."""

    channels: int = 512
    mid_channels: int = 128
    rdb_blocks: int = 2
    rdb_layers: int = 3
    channel_growth: int = 64
    emb_nums: int = 3
    with_rdb: bool = True
    with_taf: bool = True
    dtype: Any = jnp.float32
    dcn_impl: str = "windowed"
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="conv1")(x))
        if self.with_rdb:
            for i in range(self.rdb_blocks):
                h = RDB(self.channels, self.channel_growth,
                        num_layers=self.rdb_layers, dtype=self.dtype,
                        name=f"rdb{i}")(h)
        if self.with_taf:
            h = TemporalAttentionFusion(
                self.channels, self.mid_channels, emb_nums=self.emb_nums,
                dtype=self.dtype, dcn_impl=self.dcn_impl,
                dcn_radius=self.dcn_radius, name="taf"
            )(h)
        h = nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="conv2")(h)
        return x + h


class Denoising2Aggregator(nn.Module):
    """Multi-stage variant (registered as the reference's typo'd
    ``Denoising2Aggergator``)."""

    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    mid_channels: Sequence[int] = (64, 128, 256, 512)
    out_channels: Sequence[int] = (512, 1024, 2048, 512)
    rdb_blocks: Sequence[int] = (2, 2, 4, 2)
    channel_growth: Sequence[int] = (64, 64, 64, 64)
    taf_embs: Sequence[int] = (3, 3, 3, 3)
    downsample: Sequence[bool] = (True, True, False, False)
    with_rdb: Sequence[bool] = (True, True, True, True)
    with_taf: Sequence[bool] = (True, True, True, True)
    dtype: Any = jnp.float32
    dcn_impl: str = "windowed"
    dcn_radius: int = 3

    @nn.compact
    def __call__(
        self, x_noise: Sequence[jnp.ndarray], all_x: Sequence[jnp.ndarray]
    ) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        """x_noise: per-stage noisy features [T, h_i, w_i, C_i]; all_x: neck
        features. Returns (denoised stage feats, neck feats + last fusion)."""
        n = len(self.in_channels)
        x_noise_out = []
        x_list = []
        # rematerialized blocks: the per-stage RDB concat chains and the
        # temporal-attention fusion are the HBM peak at full resolution —
        # recompute them in the backward pass
        RematRDB = nn.remat(RDB)
        RematTAF = nn.remat(TemporalAttentionFusion)
        for i in range(n):
            if i == 0:
                f = x_noise[0]
            else:
                f = jnp.concatenate([x_noise[i], x_list[i - 1]], axis=-1)
            x = nn.Conv(self.in_channels[i], (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"stage{i}_conv1")(f)
            if self.with_rdb[i]:
                for j in range(self.rdb_blocks[i]):
                    x = RematRDB(self.in_channels[i], self.channel_growth[i],
                                 dtype=self.dtype, name=f"stage{i}_rdb{j}")(x)
            if self.with_taf[i]:
                x = RematTAF(
                    self.in_channels[i], self.mid_channels[i],
                    emb_nums=self.taf_embs[i], dtype=self.dtype,
                    dcn_impl=self.dcn_impl, dcn_radius=self.dcn_radius,
                    name=f"stage{i}_taf",
                )(x)
            x_noise_out.append(x + x_noise[i])
            inp = x if i == n - 1 else x + x_noise[i]
            stride = 2 if self.downsample[i] else 1
            x = nn.Conv(self.out_channels[i], (3, 3),
                        strides=(stride, stride), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"stage{i}_conv2")(inp)
            x_list.append(x)

        all_x_out = tuple(all_x[-1] + x_list[-1] for _ in all_x)
        return tuple(x_noise_out), all_x_out
