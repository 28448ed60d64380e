"""DetectoRS components (SAC + RFP) and TridentNet backbone.

Parity targets:
- SAC — Switchable Atrous Convolution (mmdetection/mmdet/models/backbones/
  detectors_resnet.py + mmcv SAConv2d): the SAME 3x3 weight evaluated at
  dilation 1 and dilation 3, blended per-pixel by a switch
  (avgpool -> 1x1 conv -> sigmoid), with pre/post global-context 1x1 convs.
- RFP — Recursive Feature Pyramid (mmdet/models/necks/rfp.py): run
  backbone+FPN, feed the FPN outputs back into the backbone stages
  (rfp_feat 1x1 adapters) for a second unrolled step, then fuse the two
  FPN pyramids with a learned per-pixel sigmoid weight.
- TridentNet (mmdet/models/backbones/trident_resnet.py): stage-3 blocks
  evaluated as 3 WEIGHT-SHARED branches at dilations (1, 2, 3); branches
  ride the batch axis here (concat), the test-branch selection picks
  branch 1 (dilation 2) at inference.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ARCH_SETTINGS, FrozenBatchNorm, ResNet


class SAConv(nn.Module):
    """Switchable atrous 3x3 conv (weight shared across dilations)."""

    channels: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1], self.channels))
        w = w.astype(self.dtype)
        # global context pre-conv
        ctx = jnp.mean(x, axis=(-3, -2), keepdims=True)
        x = x + nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                        name="pre_context")(ctx)
        switch = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), dtype=self.dtype, name="switch")(
            nn.avg_pool(x, (5, 5), strides=(self.stride,) * 2,
                        padding=[(2, 2)] * 2)).astype(jnp.float32))

        def conv(dil):
            return jax.lax.conv_general_dilated(
                x, w, (self.stride,) * 2, [(dil, dil)] * 2,
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out = (switch * conv(1).astype(jnp.float32)
               + (1 - switch) * conv(3).astype(jnp.float32)).astype(self.dtype)
        ctx2 = jnp.mean(out, axis=(-3, -2), keepdims=True)
        out = out + nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                            name="post_context")(ctx2)
        return out


class SACBottleneck(nn.Module):
    """Bottleneck whose 3x3 is a SAC (DetectoRS detectors_resnet.py)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(out))
        out = SAConv(self.planes, stride=self.stride, dtype=self.dtype,
                     name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="downsample_bn")(identity)
        out = out + identity
        if rfp_feat is not None:
            # recursive feedback adapter (rfp_inplanes path)
            out = out + nn.Conv(self.planes * 4, (1, 1), dtype=self.dtype,
                                name="rfp_conv")(rfp_feat)
        return nn.relu(out)


class DetectoRSResNet(nn.Module):
    """R50 with SAC bottlenecks in stages 2-4 + optional RFP feedback inputs."""

    depth: int = 50
    base_channels: int = 64
    out_indices: Sequence[int] = (0, 1, 2, 3)
    sac_stages: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rfp_feats=None) -> Tuple[jnp.ndarray, ...]:
        from .resnet import Bottleneck

        _, stage_blocks = ARCH_SETTINGS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3)] * 2, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        outs = {}
        for i in range(4):
            planes = self.base_channels * (2 ** i)
            stride = 1 if i == 0 else 2
            use_sac = i in self.sac_stages
            for j in range(stage_blocks[i]):
                first = j == 0
                needs = first and (stride != 1 or x.shape[-1] != planes * 4)
                if use_sac:
                    rfp = (rfp_feats[i] if (rfp_feats is not None and first)
                           else None)
                    x = SACBottleneck(planes=planes,
                                      stride=stride if first else 1,
                                      downsample=needs, dtype=self.dtype,
                                      name=f"layer{i + 1}_{j}")(x, rfp)
                else:
                    x = Bottleneck(planes=planes,
                                   stride=stride if first else 1,
                                   downsample=needs, dtype=self.dtype,
                                   name=f"layer{i + 1}_{j}")(x)
            outs[i] = x
        return tuple(outs[i] for i in self.out_indices)


class RFP(nn.Module):
    """Recursive Feature Pyramid: 2 unrolled backbone+FPN steps with
    feedback, fused by a learned sigmoid weight (rfp.py)."""

    rfp_steps: int = 2
    out_channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, imgs):
        from ..necks.fpn import FPN

        backbone = DetectoRSResNet(dtype=self.dtype, name="rfp_backbone")
        neck = FPN(out_channels=self.out_channels, num_outs=5,
                   add_extra_convs="on_output", dtype=self.dtype, name="neck")
        feats = backbone(imgs)
        pyr = list(neck(feats))
        for step in range(1, self.rfp_steps):
            # resize FPN outs back to the stage resolutions as feedback
            fb = []
            for i, f in enumerate(feats):
                src = pyr[min(i, len(pyr) - 1)]
                fb.append(jax.image.resize(
                    src, src.shape[:-3] + f.shape[-3:-1] + (src.shape[-1],),
                    "nearest"))
            feats2 = backbone(imgs, rfp_feats=fb)
            pyr2 = list(neck(feats2))
            for i in range(len(pyr)):
                w = jax.nn.sigmoid(nn.Conv(
                    1, (1, 1), dtype=self.dtype,
                    name=f"rfp_weight_s{step}_l{i}")(pyr2[i]).astype(
                    jnp.float32))
                pyr[i] = (w * pyr2[i].astype(jnp.float32)
                          + (1 - w) * pyr[i].astype(jnp.float32)
                          ).astype(self.dtype)
        return tuple(pyr)


class TridentBottleneck(nn.Module):
    """Weight-shared bottleneck evaluated at 3 dilations; branches on the
    batch axis (trident_resnet.py TridentBottleneck)."""

    planes: int
    dilations: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        w1 = self.param("conv1_kernel", nn.initializers.he_normal(),
                        (1, 1, xs[0].shape[-1], self.planes))
        w2 = self.param("conv2_kernel", nn.initializers.he_normal(),
                        (3, 3, self.planes, self.planes))
        w3 = self.param("conv3_kernel", nn.initializers.he_normal(),
                        (1, 1, self.planes, self.planes * 4))
        bn1 = FrozenBatchNorm(dtype=self.dtype, name="bn1")
        bn2 = FrozenBatchNorm(dtype=self.dtype, name="bn2")
        bn3 = FrozenBatchNorm(dtype=self.dtype, name="bn3")
        needs_ds = xs[0].shape[-1] != self.planes * 4
        if needs_ds:
            wd = self.param("ds_kernel", nn.initializers.he_normal(),
                            (1, 1, xs[0].shape[-1], self.planes * 4))
            bnd = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")

        outs = []
        for x, dil in zip(xs, self.dilations):
            x = x.astype(self.dtype)
            o = jax.lax.conv_general_dilated(
                x, w1.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            o = nn.relu(bn1(o))
            o = jax.lax.conv_general_dilated(
                o, w2.astype(self.dtype), (1, 1), [(dil, dil)] * 2,
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            o = nn.relu(bn2(o))
            o = jax.lax.conv_general_dilated(
                o, w3.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            o = bn3(o)
            idt = x
            if needs_ds:
                idt = bnd(jax.lax.conv_general_dilated(
                    x, wd.astype(self.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            outs.append(nn.relu(o + idt))
        return outs


class TridentResNet(nn.Module):
    """R50 whose stage 3 is trident (3 shared-weight dilation branches).

    Returns the 3 branch outputs stacked on a leading axis at train time;
    ``test_branch_idx=1`` selects the middle branch at inference."""

    depth: int = 50
    num_trident_blocks: int = 3
    test_mode: bool = False
    test_branch_idx: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        trunk = ResNet(depth=self.depth, out_indices=(2,),
                       frozen_stages=1, dtype=self.dtype, name="trunk")
        (c4,) = trunk(x)
        xs = [c4, c4, c4]
        for j in range(self.num_trident_blocks):
            xs = TridentBottleneck(planes=512, dtype=self.dtype,
                                   name=f"trident_{j}")(xs)
        if self.test_mode:
            return xs[self.test_branch_idx]
        return jnp.stack(xs, axis=0)
