"""Additional FPN-family necks: PAFPN, HRFPN, BFP, NAS-FPN, FPG-lite.

Parity targets (mmdetection/mmdet/models/necks/):
- PAFPN (pafpn.py:11): FPN + bottom-up path augmentation (strided 3x3
  downsample convs + add, then output convs).
- HRFPN (hrfpn.py:11): concat all HRNet branches at the highest resolution,
  1x1 reduce, then avg-pool to num_outs levels + 3x3 convs.
- BFP (bfp.py:12, "Libra R-CNN"): gather all levels to the middle one,
  average, refine (3x3 conv here — the non-local option degenerates),
  scatter the residual back to every level.
- NAS-FPN (nas_fpn.py:14): stack_times merging cells of the discovered
  architecture (GP and sum cells over P3-P7).
- FPG (fpg.py): multi-pathway feature pyramid grid — implemented as
  stack_times of alternating same/up/down fusion (the regular grid
  pattern), the paper's regular-grid core.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_to(x, ref_hw, method="nearest"):
    return jax.image.resize(
        x, x.shape[:-3] + tuple(ref_hw) + (x.shape[-1],), method)


class PAFPN(nn.Module):
    """FPN + bottom-up augmentation (pafpn.py:11, PANet)."""

    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x.astype(self.dtype))
            for i, x in enumerate(inputs)
        ]
        for i in range(n_in - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize_to(
                laterals[i], laterals[i - 1].shape[-3:-1])
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"fpn_conv{i}")(laterals[i])
            for i in range(n_in)
        ]
        # bottom-up path augmentation
        for i in range(n_in - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[(1, 1)] * 2, dtype=self.dtype,
                           name=f"downsample_conv{i}")(inter[i])
            inter[i + 1] = inter[i + 1] + down
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"pafpn_conv{i}")(inter[i])
            for i in range(1, n_in)
        ]
        for _ in range(self.num_outs - n_in):
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


class HRFPN(nn.Module):
    """HRNet feature pyramid (hrfpn.py:11)."""

    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        ref_hw = inputs[0].shape[-3:-1]
        ups = [inputs[0].astype(self.dtype)] + [
            _resize_to(x.astype(self.dtype), ref_hw, "bilinear")
            for x in inputs[1:]
        ]
        cat = jnp.concatenate(ups, axis=-1)
        feat = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="reduction_conv")(cat)
        outs = []
        cur = feat
        for i in range(self.num_outs):
            pooled = feat if i == 0 else nn.avg_pool(
                feat, (2 ** i, 2 ** i), strides=(2 ** i, 2 ** i))
            outs.append(nn.Conv(self.out_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f"fpn_conv{i}")(pooled))
            cur = pooled
        return tuple(outs)


class BFP(nn.Module):
    """Balanced Feature Pyramid (bfp.py:12): gather -> refine -> scatter."""

    out_channels: int = 256
    refine_level: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        ref_hw = inputs[self.refine_level].shape[-3:-1]
        gathered = []
        for i, x in enumerate(inputs):
            x = x.astype(self.dtype)
            if i < self.refine_level:
                s = 2 ** (self.refine_level - i)
                x = nn.max_pool(x, (s, s), strides=(s, s))
                # guard odd sizes
                x = _resize_to(x, ref_hw)
            elif i > self.refine_level:
                x = _resize_to(x, ref_hw)
            gathered.append(x)
        bsf = sum(gathered) / len(gathered)
        bsf = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                      dtype=self.dtype, name="refine")(bsf)
        outs = []
        for i, x in enumerate(inputs):
            res = _resize_to(bsf, x.shape[-3:-1],
                             "nearest" if i <= self.refine_level else "nearest")
            outs.append(x.astype(self.dtype) + res)
        return tuple(outs)


class _SumCell(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, a, b, out_hw):
        a = _resize_to(a, out_hw) if a.shape[-3:-1] != tuple(out_hw) else a
        b = _resize_to(b, out_hw) if b.shape[-3:-1] != tuple(out_hw) else b
        x = nn.relu(a + b)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="conv")(x)
        return x


class _GPCell(nn.Module):
    """Global-pool attention cell (nas_fpn.py GlobalPoolingCell)."""

    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, a, b, out_hw):
        a = _resize_to(a, out_hw) if a.shape[-3:-1] != tuple(out_hw) else a
        b = _resize_to(b, out_hw) if b.shape[-3:-1] != tuple(out_hw) else b
        att = jax.nn.sigmoid(jnp.mean(a, axis=(-3, -2), keepdims=True))
        x = nn.relu(a + b * att)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="conv")(x)


class NASFPN(nn.Module):
    """NAS-FPN (nas_fpn.py:14): stack_times of the searched 7-cell motif
    over 5 levels."""

    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        # adapt inputs to 5 levels of out_channels
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"adapt{i}")(x.astype(self.dtype))
            for i, x in enumerate(inputs)
        ]
        while len(feats) < self.num_outs:
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats[:5]
        for s in range(self.stack_times):
            hw = lambda t: t.shape[-3:-1]
            # the discovered NAS-FPN motif (nas_fpn.py forward)
            p4_1 = _GPCell(self.out_channels, dtype=self.dtype,
                           name=f"s{s}_gp64_4")(p6, p4, hw(p4))
            p4_2 = _SumCell(self.out_channels, dtype=self.dtype,
                            name=f"s{s}_sum44_4")(p4_1, p4, hw(p4))
            p3 = _SumCell(self.out_channels, dtype=self.dtype,
                          name=f"s{s}_sum43_3")(p4_2, p3, hw(p3))
            p4 = _SumCell(self.out_channels, dtype=self.dtype,
                          name=f"s{s}_sum34_4")(p3, p4_2, hw(p4))
            p5_tmp = _GPCell(self.out_channels, dtype=self.dtype,
                             name=f"s{s}_gp43_5a")(p4, p3, hw(p5))
            p5 = _SumCell(self.out_channels, dtype=self.dtype,
                          name=f"s{s}_sum55_5")(p5_tmp, p5, hw(p5))
            p7_tmp = _GPCell(self.out_channels, dtype=self.dtype,
                             name=f"s{s}_gp54_7a")(p5, p4_2, hw(p7))
            p7 = _SumCell(self.out_channels, dtype=self.dtype,
                          name=f"s{s}_sum77_7")(p7_tmp, p7, hw(p7))
            p6 = _GPCell(self.out_channels, dtype=self.dtype,
                         name=f"s{s}_gp75_6")(p7, p5, hw(p6))
        return (p3, p4, p5, p6, p7)


class FPG(nn.Module):
    """Feature Pyramid Grid, regular-grid core (fpg.py): stack_times of
    same/up/down pathway fusion across all levels."""

    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"adapt{i}")(x.astype(self.dtype))
            for i, x in enumerate(inputs)
        ]
        while len(feats) < self.num_outs:
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))
        n = len(feats)
        for s in range(self.stack_times):
            nxt = []
            for i in range(n):
                acc = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                              dtype=self.dtype, name=f"s{s}_same{i}")(feats[i])
                if i > 0:  # down pathway from higher resolution
                    acc = acc + nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f"s{s}_down{i}")(feats[i - 1])
                if i < n - 1:  # up pathway from lower resolution
                    up = _resize_to(feats[i + 1], feats[i].shape[-3:-1])
                    acc = acc + nn.Conv(
                        self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"s{s}_up{i}")(up)
                nxt.append(nn.relu(acc))
            feats = nxt
        return tuple(feats)


class FPNCarafe(nn.Module):
    """FPN with CARAFE upsampling in the top-down path
    (mmdetection/mmdet/models/necks/fpn_carafe.py)."""

    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        from ...ops.carafe import CARAFEPack

        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x.astype(self.dtype))
            for i, x in enumerate(inputs)
        ]
        for i in range(n_in - 1, 0, -1):
            pack = CARAFEPack(channels=self.out_channels,
                              dtype=jnp.float32, name=f"carafe{i}")
            up = jax.vmap(pack)(laterals[i].astype(jnp.float32)) \
                if laterals[i].ndim == 4 else pack(laterals[i])
            # CARAFE doubles H/W; crop to the lateral's odd sizes if needed
            th, tw = laterals[i - 1].shape[-3:-1]
            up = up[..., :th, :tw, :]
            laterals[i - 1] = laterals[i - 1] + up.astype(self.dtype)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"fpn_conv{i}")(laterals[i])
            for i in range(n_in)
        ]
        for _ in range(self.num_outs - n_in):
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
