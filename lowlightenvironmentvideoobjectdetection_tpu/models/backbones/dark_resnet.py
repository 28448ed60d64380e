"""Dark (denoising) ResNet backbone family.

Consolidates the reference's 13 ablation backbones
(mmtracking/mmtrack/models/backbones/) into ONE parameterized module:

- ``DarkResNet`` / ``DarkRAWResNet`` (dark_resnet.py:387/712): ResNet where a
  stage's Bottlenecks replace their 3x3 conv with a **ConvLSTM over the frame
  axis** (batch dim = time): shared gate conv producing i/f/o/g
  (dark_resnet.py:211-230), sequential scan (dark_resnet.py:232-242).
- ``ResNet_A`` / ``RAWResNetA`` (resnet_A.py:499/824) and ``ResNet_B``
  (resnet_B.py:499): DenoisingA/B_Block — **bidirectional** ConvLSTM whose
  inputs are first aligned to the center frame by ModulatedDCNPack (DCNv2)
  (resnet_A.py:331-353); A = stage 4, B = stages 3+4.
- ``ResNet_B1`` (resnet_B1.py:690), ``ResNetC`` (resnet_C.py:295),
  ``ResNetD`` (resnet_D.py:334), ``ResNetE/F/G`` (resnet_E/F/G.py): plain
  Bottlenecks + ``LayerDenoisingPlugin`` (resnet_C.py:61-185: 1x1 reduce →
  offset conv → DCNv2 temporal alignment → embed conv → softmax over frames →
  1x1 expand, residual); D adds CBAM channel/spatial attention
  (resnet_D.py:61-92).
- ``ResNetH`` (resnet_H.py:124) and ``InsertResNet`` (insert_resnet.py:122):
  plain ResNet re-exports (plugin-insertable).

TPU-first notes:
- The frame axis is the leading axis; the ConvLSTM is a python-unrolled
  recurrence over a *static* frame count with one shared gate conv — XLA
  pipelines the per-frame convs.
- The reference's DenoisingBlock applies its stage stride *inside* the
  recurrent conv, which breaks the hidden-state shape after step 0 (a
  latent bug as-committed). Here the stride is applied by a separate 3x3
  conv before the recurrence, which keeps the intended semantics with
  consistent shapes.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..aggregators.denoising_aggregator import ModulatedDCNPack
from .resnet import ARCH_SETTINGS, Bottleneck, FrozenBatchNorm


class ConvLSTMBottleneck(nn.Module):
    """Bottleneck whose 3x3 conv is a ConvLSTM over the frame axis.

    ``bidirectional=True`` adds DCNv2 alignment to the center frame before
    each step plus a reverse pass (DenoisingA/B_Block, resnet_A.py:331-353).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    bidirectional: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [T, H, W, C] — T frames of one clip."""
        d = self.dtype
        p = self.planes
        identity = x
        out = nn.Conv(p, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        out = FrozenBatchNorm(dtype=d, name="bn1")(out)
        out = nn.relu(out)

        # stride/dilation handled by a plain 3x3 conv BEFORE the recurrence
        # (see module docstring)
        out = nn.Conv(
            p, (3, 3), strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, dtype=d, name="conv2",
        )(out)

        t = out.shape[0]
        gate_f = nn.Conv(4 * p, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                         dtype=d, name="gate_f")

        def lstm_step(gate, x_i, h, c):
            gates = gate(jnp.concatenate([x_i, h], axis=-1))
            i_g, f_g, o_g, g_g = jnp.split(gates, 4, axis=-1)
            c_next = jax.nn.sigmoid(f_g) * c + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
            h_next = jax.nn.sigmoid(o_g) * jnp.tanh(c_next)
            return h_next, c_next

        if self.bidirectional:
            dcn_f = ModulatedDCNPack(p, deform_groups=8, dtype=jnp.float32,
                                     name="dcn_f")
            dcn_b = ModulatedDCNPack(p, deform_groups=8, dtype=jnp.float32,
                                     name="dcn_b")
            gate_b = nn.Conv(4 * p, (3, 3), padding=[(1, 1)] * 2,
                             use_bias=False, dtype=d, name="gate_b")
            ref = jnp.broadcast_to(out[t // 2][None], out.shape)
            aligned_f = dcn_f(out.astype(jnp.float32),
                              ref.astype(jnp.float32)).astype(d)
            h = c = jnp.zeros_like(out[0])
            hs = []
            for i in range(t):
                h, c = lstm_step(gate_f, aligned_f[i], h, c)
                hs.append(h)
            fwd = jnp.stack(hs)
            ref2 = jnp.broadcast_to(fwd[t // 2][None], fwd.shape)
            aligned_b = dcn_b(fwd.astype(jnp.float32),
                              ref2.astype(jnp.float32)).astype(d)
            h = c = jnp.zeros_like(out[0])
            hs = []
            for i in range(t - 1, -1, -1):
                h, c = lstm_step(gate_b, aligned_b[i], h, c)
                hs.append(h)
            out = jnp.stack(hs[::-1])
        else:
            h = c = jnp.zeros_like(out[0])
            hs = []
            for i in range(t):
                h, c = lstm_step(gate_f, out[i], h, c)
                hs.append(h)
            out = jnp.stack(hs)

        out = FrozenBatchNorm(dtype=d, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(p * 4, (1, 1), use_bias=False, dtype=d, name="conv3")(out)
        out = FrozenBatchNorm(dtype=d, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(p * 4, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=d, name="downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=d, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class CBAM(nn.Module):
    """Channel + spatial attention (resnet_D.py:61-92)."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Conv(max(c // self.reduction, 1), (1, 1), use_bias=False,
                      dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")
        avg = jnp.mean(x, axis=(-3, -2), keepdims=True)
        mx = jnp.max(x, axis=(-3, -2), keepdims=True)
        ch = jax.nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))
        x = x * ch
        sp_in = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True), jnp.max(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        sp = jax.nn.sigmoid(
            nn.Conv(1, (7, 7), padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name="spatial")(sp_in)
        )
        return x * sp


class LayerDenoisingPlugin(nn.Module):
    """Per-stage feature-space denoising plugin (resnet_C.py:61-185).

    1x1 reduce (C -> C/4) → per-frame DCNv2 temporal fusion (each frame as
    reference: offset conv on [frames, ref] concat → DCNv2 align → embed conv
    of aligned*ref → softmax over frames → weighted sum) → 1x1 expand;
    residual. ``with_cbam`` adds CBAM after fusion (ResNetD).
    """

    with_cbam: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [T, H, W, C]."""
        d = self.dtype
        c = x.shape[-1]
        p = c // 4
        identity = x
        out = nn.Conv(p, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        out = FrozenBatchNorm(dtype=d, name="bn1")(out)
        out = nn.relu(out)

        offset_conv = nn.Conv(p, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                              dtype=d, name="offset_conv")
        dcn = ModulatedDCNPack(p, deform_groups=8, dtype=jnp.float32,
                               name="dcn_pack")
        emb_conv = nn.Conv(p, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                           dtype=d, name="emb_conv")

        def fuse_one(ref):
            refs = jnp.broadcast_to(ref[None], out.shape)
            x_set = offset_conv(jnp.concatenate([out, refs], axis=-1))
            x_dcn = dcn(out.astype(jnp.float32),
                        x_set.astype(jnp.float32)).astype(d)
            x_cor = jax.nn.softmax(emb_conv(x_dcn * refs), axis=0)
            return jnp.sum(x_cor * out, axis=0)

        # sequential fusion over frames (see TemporalAttentionFusion): /T peak
        fused = jnp.stack([fuse_one(out[i]) for i in range(out.shape[0])])
        fused = FrozenBatchNorm(dtype=d, name="bn2")(fused)
        fused = nn.relu(fused)
        if self.with_cbam:
            fused = CBAM(dtype=d, name="cbam")(fused)
        fused = nn.Conv(c, (1, 1), use_bias=False, dtype=d, name="conv3")(fused)
        fused = FrozenBatchNorm(dtype=d, name="bn3")(fused)
        return nn.relu(fused + identity)


class DarkResNet(nn.Module):
    """Parameterized dark-backbone: per-stage temporal blocks and plugins.

    ``temporal_stages``: stages (0-based) whose blocks are ConvLSTM
    bottlenecks; ``bidirectional`` selects the DCN-aligned bi-LSTM variant
    (ResNet_A/B). ``plugin_stages``: stages that get a LayerDenoisingPlugin
    appended after their blocks (ResNet_B1/C/D/E/F/G, insert-plugins configs).
    """

    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    temporal_stages: Sequence[int] = ()
    bidirectional: bool = False
    plugin_stages: Sequence[int] = ()
    with_cbam: bool = False
    # plugin flavor appended at ``plugin_stages``: "layer" = the per-layer
    # DCNv2 fusion plugin (resnet_C.py:61-185); "aggregator" = a
    # DenoisingAggregator RDB+TAF block as in the reference's InsertResNet
    # (insert_resnet.py:93-97, insert_cfg type='DenoisingAggregator') with
    # the rdb/taf ablation knobs of the insert-plugins configs
    plugin_type: str = "layer"
    plugin_rdb_blocks: int = 1
    plugin_rdb_layers: int = 3
    plugin_emb_nums: int = 3
    plugin_with_rdb: bool = True
    plugin_with_taf: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        """x: [T, H, W, in_channels] — the leading axis is the frame axis."""
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_type == "bottleneck", "dark variants are ResNet-50/101"

        x = x.astype(self.dtype)
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3)] * 2, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = {}
        for i in range(self.num_stages):
            planes = self.base_channels * (2 ** i)
            stride = self.strides[i]
            dilation = self.dilations[i]
            temporal = i in self.temporal_stages
            for j in range(stage_blocks[i]):
                first = j == 0
                in_c = x.shape[-1]
                needs_ds = first and (stride != 1 or in_c != planes * 4)
                common = dict(
                    planes=planes, stride=stride if first else 1,
                    dilation=dilation, downsample=needs_ds, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )
                if temporal:
                    x = ConvLSTMBottleneck(
                        bidirectional=self.bidirectional, **common
                    )(x)
                else:
                    x = Bottleneck(**common)(x)
            if i in self.plugin_stages:
                if self.plugin_type == "aggregator":
                    from ..aggregators.denoising_aggregator import (
                        DenoisingAggregator,
                    )

                    x = DenoisingAggregator(
                        channels=x.shape[-1], mid_channels=planes,
                        rdb_blocks=self.plugin_rdb_blocks,
                        rdb_layers=self.plugin_rdb_layers,
                        channel_growth=64,
                        emb_nums=self.plugin_emb_nums,
                        with_rdb=self.plugin_with_rdb,
                        with_taf=self.plugin_with_taf,
                        dtype=self.dtype, name=f"plugin{i + 1}",
                    )(x)
                else:
                    x = LayerDenoisingPlugin(
                        with_cbam=self.with_cbam, dtype=self.dtype,
                        name=f"plugin{i + 1}",
                    )(x)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            outs[i] = x
        return tuple(outs[i] for i in self.out_indices)


# Variant table: reference class name -> DarkResNet config overrides.
# (Stage indices are 0-based; reference "layer4" = stage index 3.)
DARK_VARIANTS = {
    "DarkResNet": dict(temporal_stages=(1,)),  # dark_resnet.py:394 (R50)
    "DarkRAWResNet": dict(temporal_stages=(1,), in_channels=4),
    "ResNet_A": dict(temporal_stages=(3,), bidirectional=True),  # resnet_A.py:505
    "RAWResNetA": dict(temporal_stages=(3,), bidirectional=True, in_channels=4),
    "ResNet_B": dict(temporal_stages=(2, 3), bidirectional=True),
    "ResNet_B1": dict(plugin_stages=(2, 3)),
    "ResNetC": dict(plugin_stages=(3,)),
    "ResNetD": dict(plugin_stages=(3,), with_cbam=True),
    "ResNetE": dict(plugin_stages=(2,)),
    "ResNetF": dict(plugin_stages=(1, 2, 3)),
    "ResNetG": dict(plugin_stages=(0, 1, 2, 3)),
    "ResNetH": dict(),  # plain ResNet re-export
    "InsertResNet": dict(),  # plugin-insertable plain ResNet; pass plugin_stages
}


def make_dark_backbone(variant: str, **overrides) -> DarkResNet:
    """Build any reference dark-backbone variant by its registered name.

    ``overrides`` may include flax kwargs like ``name=`` (module name).
    """
    if variant not in DARK_VARIANTS:
        raise KeyError(f"unknown dark backbone {variant!r}; "
                       f"known: {sorted(DARK_VARIANTS)}")
    cfg = dict(DARK_VARIANTS[variant])
    cfg.update(overrides)
    return DarkResNet(**cfg)
