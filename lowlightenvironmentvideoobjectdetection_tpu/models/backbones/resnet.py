"""ResNet backbone (flax.linen, NHWC, TPU-first).

Capability parity with the reference's mmdet ResNet
(mmdetection/mmdet/models/backbones/resnet.py:303, 'pytorch' style: stride on
the 3x3 conv) as configured by the VID models
(mmtracking/configs/_base_/models/faster_rcnn_r50_dc5.py:5-15):
``depth=50, strides=(1,2,2,1), dilations=(1,1,1,2)`` (DC5, output stride 16),
``out_indices`` selecting stage outputs (duplicates allowed — the dual-branch
low-light scheme uses e.g. ``(0,1,2,3,3)``), ``frozen_stages`` and
``norm_eval=True``.

TPU-first design decisions:
- NHWC layout; convolutions map straight onto the MXU.
- BatchNorm is *folded* to a per-channel affine (FrozenBN): the reference
  always runs BN in eval mode during detection training (norm_eval=True), so
  running statistics are constants. gamma/beta stay trainable; mean/var live
  as constants in the params tree for checkpoint import.
- ``frozen_stages`` is realized functionally with ``stop_gradient`` on the
  frozen prefix's output (identical gradients to requires_grad=False).
- Compute dtype is configurable (bfloat16 by default for the MXU); params are
  float32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BN with frozen running statistics (the norm_eval=True regime).

    y = (x - mean) / sqrt(var + eps) * gamma + beta. mean/var are
    non-trainable variables (collection 'batch_stats'); gamma/beta are params.
    """

    eps: float = 1e-5
    dtype: Any = jnp.float32
    # packed > 1: the input carries `packed` spatial positions interleaved in
    # its channel dim (order (position, channel), channel minor — the fused
    # stem's layout); params keep the canonical per-channel shape and the
    # affine is tiled across positions.
    packed: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // self.packed
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        scale = (gamma / jnp.sqrt(var + self.eps)).astype(self.dtype)
        bias = (beta - mean * gamma / jnp.sqrt(var + self.eps)).astype(self.dtype)
        if self.packed > 1:
            scale = jnp.tile(scale, self.packed)
            bias = jnp.tile(bias, self.packed)
        return x * scale + bias


class Bottleneck(nn.Module):
    """Standard bottleneck; with ``groups > 1`` it is the ResNeXt block
    (mmdetection/mmdet/models/backbones/resnext.py:12 — mid width =
    planes * base_width/64 * groups, grouped 3x3)."""

    planes: int  # bottleneck width; output channels = planes * 4
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = nn.Conv(
            width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            width,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class StemConv(nn.Module):
    """The 7x7/2 stem conv, optionally computed via space-to-depth.

    With 3 (or 4, RAW) input channels the MXU runs the stem at ~3/128
    contraction efficiency — the classic TPU fix (MLPerf ResNet) packs the
    input 2x2 into 4C channels and convolves with an exactly-equivalent
    repacked kernel: out[i] = sum_k w[k] x[2i+k-3] rewritten over
    X[j,b] = x[2j+b] as a 4-tap stride-1 conv with taps
    W2[t,b] = w[2t+b-1] (zero-padded at the out-of-range corner). The
    parameter stays the canonical [7, 7, C, out] tensor — the tree and any
    imported torch checkpoints are unchanged; only the compute is repacked.
    """

    features: int
    dtype: Any = jnp.bfloat16
    space_to_depth: bool = False
    # packed_in: pack level of the input — the MLPerf-TPU-style "conv0
    # space-to-depth" input contract; the host pipeline packs for free as
    # part of normalize/pad and the parameter tree is unchanged.
    #   1 (or True): one pack_frame — [n, h/2, w/2, 4c]; the 7x7/2 conv runs
    #     as a 4-tap/stride-1 conv over 12 channels. Skips the ~370 us/frame
    #     on-device repack (shallow 3-ch conv + entry relayout copy).
    #   2: pack_frame twice — [n, h/4, w/4, 16c]; the conv becomes a DENSE
    #     3x3 48->256 conv emitting the conv1 output 2x2-packed (s, t, k)
    #     for stem_packed_maxpool. 2.9x the MACs of the 7x7 but on the
    #     MXU-efficient deep-conv path: measured 543 -> 175 us for the whole
    #     conv+bn+relu+pool stem at 608x1024 on v5e.
    packed_in: int = 0
    # packed_out: emit the conv1 output 2x2-packed into channels — shape
    # [n, h/4, w/4, 4F] with channel order (s, t, k) (k minor; the s halves
    # are lane-register aligned at 4F=256). Realized as ONE 9x9/stride-4
    # conv whose kernel is the 7x7 weight scattered per (s, t) phase:
    # y2[i,j,(s,t,k)] = y[2i+s, 2j+t, k] where y is the plain 7x7/2 pad-3
    # conv. Taps: y[2i+s] = sum_dy x[4i + (2s+dy-3)]; with u = a-3 (a in
    # [0,9)) this needs dy = a - 2s, in range for a in [2s, 2s+7). The
    # 304x512x64 unpacked tensor never exists — downstream consumes the
    # packed layout directly (see stem_packed_maxpool).
    packed_out: bool = False

    @nn.compact
    def __call__(self, x):
        lvl = int(self.packed_in)
        c = x.shape[-1] // (4 ** lvl)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, c, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        n, h, w = x.shape[:3]
        if lvl == 2:
            # dense s4d kernel [3, 3, 16c, 4F]: K3[u, v, (rho, sig, cc),
            # (s, t, kk)] = W7[4u+rho+3-2s, 4v+sig+3-2t, cc, kk] (zero when
            # the tap falls outside the 7x7 support). Built by gathering
            # from the zero-padded [9, 9, c, F] weight with precomputed
            # numpy index constants — no traced scatter loop.
            dy = np.zeros((3, 3, 16 * c, 4), np.int64)
            dx = np.zeros((3, 3, 16 * c, 4), np.int64)
            cc = np.zeros((3, 3, 16 * c, 4), np.int64)
            for u in range(3):
                for v in range(3):
                    for rho in range(4):
                        for sig in range(4):
                            for ch in range(c):
                                cin = (((rho // 2) * 2 + (sig // 2)) * 4
                                       + (rho % 2) * 2 + (sig % 2)) * c + ch
                                for s in range(2):
                                    for t in range(2):
                                        dyy = 4 * (u - 1) + rho + 3 - 2 * s
                                        dxx = 4 * (v - 1) + sig + 3 - 2 * t
                                        ok = 0 <= dyy < 7 and 0 <= dxx < 7
                                        st = 2 * s + t
                                        # out-of-support taps hit the zero
                                        # pad plane (index 7+)
                                        dy[u, v, cin, st] = dyy if ok else 7
                                        dx[u, v, cin, st] = dxx if ok else 7
                                        cc[u, v, cin, st] = ch
            w9 = jnp.pad(k, ((0, 2), (0, 2), (0, 0), (0, 0)))
            k3 = w9[dy, dx, cc]  # [3, 3, 16c, 4, F]
            k3 = k3.reshape(3, 3, 16 * c, 4 * self.features)
            return lax.conv_general_dilated(
                x.astype(self.dtype), k3, window_strides=(1, 1),
                padding=[(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if lvl == 1:
            wp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w2 = wp.reshape(4, 2, 4, 2, c, self.features)
            w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(
                4, 4, 4 * c, self.features)
            return lax.conv_general_dilated(
                x.astype(self.dtype), w2, window_strides=(1, 1),
                padding=[(2, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.packed_out and h % 4 == 0 and w % 4 == 0:
            k9 = jnp.zeros((9, 9, c, 2, 2, self.features), self.dtype)
            for s in (0, 1):
                for t in (0, 1):
                    k9 = k9.at[2 * s:2 * s + 7, 2 * t:2 * t + 7, :, s, t, :].set(k)
            k9 = k9.reshape(9, 9, c, 4 * self.features)
            # pad: lowest input index 4*0 + (0-3) = -3; highest
            # 4*(h/4-1) + 5 = h+1 -> (3, 2)
            return lax.conv_general_dilated(
                x, k9, window_strides=(4, 4), padding=[(3, 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if not (self.space_to_depth and h % 2 == 0 and w % 2 == 0):
            return lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding=[(3, 3)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # Pack 2x2 pixels into channels with a ONE-HOT stride-2 conv rather
        # than reshape/transpose: profiled on v5e, the 6D reshape+transpose
        # lowers to lane-shuffle copies costing ~1.3 ms/frame at 608x1008
        # (the single most expensive "op" in the whole streaming step), while
        # the conv engine's native strided windowing does the same repack in
        # ~0.2 ms fused with the 4-tap conv (full stem 974 -> 484 us).
        eye = np.zeros((2, 2, c, 4 * c), np.float32)
        for a in range(2):
            for b in range(2):
                for cc in range(c):
                    eye[a, b, cc, (2 * a + b) * c + cc] = 1.0
        xs = lax.conv_general_dilated(
            x, jnp.asarray(eye, self.dtype), window_strides=(2, 2),
            padding=[(0, 0)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # wp[2t+b] = w[2t+b-1]; index 0 (t=0, b=0 -> source -1) is zero
        wp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        # kernel channel order matches the pack: (2a+b)*c + cc
        w2 = wp.reshape(4, 2, 4, 2, c, self.features)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        return lax.conv_general_dilated(
            xs, w2, window_strides=(1, 1), padding=[(2, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pack_frame(x):
    """Space-to-depth pack [..., h, w, c] -> [..., h/2, w/2, 4c].

    Channel order (a, b, cc) -> (2a+b)*c+cc, matching the one-hot pack conv
    in StemConv and the ``packed_in`` input contract. Host pipelines call
    this (on numpy or jnp arrays) after normalize/pad, so the device graph
    never pays the ~370 us/frame on-device repack; equivalent to the MLPerf
    ResNet TPU submissions' conv0 space-to-depth input transform.
    """
    h, w, c = x.shape[-3:]
    y = x.reshape(x.shape[:-3] + (h // 2, 2, w // 2, 2, c))
    if isinstance(y, np.ndarray):
        y = np.moveaxis(y, -4, -3)
    else:
        nd = y.ndim
        perm = list(range(nd - 5)) + [nd - 5, nd - 3, nd - 4, nd - 2, nd - 1]
        y = y.transpose(perm)
    return y.reshape(x.shape[:-3] + (h // 2, w // 2, 4 * c))


def stem_packed_maxpool(y2, features):
    """3x3/stride-2/pad-1 maxpool over the 2x2-packed stem output.

    ``y2`` is [..., h/4, w/4, 4F] with channel order (s, t, k) as produced by
    ``StemConv(packed_out=True)``; the result equals
    ``max_pool(unpack(y2), (3,3), strides=(2,2), padding=1)`` without ever
    materializing the unpacked [h/2, w/2, F] tensor. The pool window at
    output (i, j) covers unpacked rows {2i-1, 2i, 2i+1} = packed
    {s1[i-1], s0[i], s1[i]} (and the same along columns with t), so the
    whole pool is three shifted channel-block maxes per axis — lane-aligned
    slices plus sublane shifts, fused by XLA into a single pass.
    """
    f2 = 2 * features
    neg = jnp.asarray(float("-inf"), y2.dtype)
    s0, s1 = y2[..., :f2], y2[..., f2:]
    pad_row = jnp.full(s1.shape[:-3] + (1,) + s1.shape[-2:], neg, y2.dtype)
    s1_up = jnp.concatenate([pad_row, s1[..., :-1, :, :]], axis=-3)
    rowmax = jnp.maximum(jnp.maximum(s0, s1), s1_up)  # [..., h/4, w/4, 2F]
    t0, t1 = rowmax[..., :features], rowmax[..., features:]
    pad_col = jnp.full(
        t1.shape[:-2] + (1, features), neg, y2.dtype)
    t1_left = jnp.concatenate([pad_col, t1[..., :-1, :]], axis=-2)
    return jnp.maximum(jnp.maximum(t0, t1), t1_left)


class ResNet(nn.Module):
    """Multi-stage ResNet.

    out_indices selects (possibly duplicated) stage outputs, matching the
    reference's ``out_indices=(0,1,2,3,3)`` trick that feeds both the
    feature-consistency loss and the neck.
    """

    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = -1
    groups: int = 1  # > 1 = ResNeXt (resnext.py:12)
    base_width: int = 4
    dtype: Any = jnp.bfloat16
    # space-to-depth stem (see StemConv): exact same math, ~4x better MXU
    # utilization on the 3-channel 7x7 input conv
    stem_s2d: bool = False
    # fused packed stem: conv1 emits its output 2x2-packed into 256
    # lane-aligned channels (one 9x9/4 conv) and the 3x3/2 maxpool runs as
    # shifted channel-block maxes over that layout (stem_packed_maxpool);
    # the [h/2, w/2, 64] intermediate and its layout copies never exist.
    # Same parameter tree; same math up to conv summation order.
    stem_fused: bool = False
    # pack level of the input (see StemConv.packed_in): 1/True = [n, h/2,
    # w/2, 4*in_channels] (one pack_frame), 2 = [n, h/4, w/4,
    # 16*in_channels] (pack_frame twice; conv1 runs as a dense 3x3 48->256
    # conv emitting the 2x2-packed layout and the maxpool as shifted
    # channel-block maxes — the fastest stem at streaming shapes)
    input_packed: int = 0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_type == "bottleneck" else BasicBlock
        expansion = 4 if block_type == "bottleneck" else 1

        x = x.astype(self.dtype)
        lvl = int(self.input_packed)
        fused = (self.stem_fused and lvl == 0
                 and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
        packed_conv1 = fused or lvl == 2  # conv1 emits (s, t, k)-packed
        x = StemConv(
            self.base_channels, dtype=self.dtype,
            space_to_depth=self.stem_s2d and not fused, packed_out=fused,
            packed_in=lvl,
            name="conv1")(x)
        x = FrozenBatchNorm(
            dtype=self.dtype, packed=4 if packed_conv1 else 1, name="bn1")(x)
        x = nn.relu(x)
        if packed_conv1:
            x = stem_packed_maxpool(x, self.base_channels)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        if self.frozen_stages >= 0:
            x = lax.stop_gradient(x)

        outs = {}
        for i in range(self.num_stages):
            planes = self.base_channels * (2 ** i)
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(stage_blocks[i]):
                first = j == 0
                in_c = x.shape[-1]
                needs_ds = first and (stride != 1 or in_c != planes * expansion)
                kw = {}
                if block_cls is Bottleneck:
                    kw = dict(groups=self.groups, base_width=self.base_width)
                x = block_cls(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                    **kw,
                )(x)
            if self.frozen_stages >= i + 1:
                x = lax.stop_gradient(x)
            outs[i] = x
        return tuple(outs[i] for i in self.out_indices)


class ResNeXt(ResNet):
    """ResNeXt-50/101 32x4d (mmdetection/mmdet/models/backbones/resnext.py:
    grouped 3x3 bottlenecks)."""

    groups: int = 32
    base_width: int = 4


def resnet_dc5(depth: int = 50, out_indices=(3,), dtype=jnp.bfloat16, **kw) -> ResNet:
    """The canonical VID backbone: R-{depth} with DC5 (stride-16 stage 4,
    dilation 2), frozen stage 1 — faster_rcnn_r50_dc5.py:5-15."""
    return ResNet(
        depth=depth,
        strides=(1, 2, 2, 1),
        dilations=(1, 1, 1, 2),
        out_indices=out_indices,
        frozen_stages=1,
        dtype=dtype,
        **kw,
    )
