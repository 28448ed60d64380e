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

from typing import Any, Optional, Sequence, Tuple

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


class NonLocal2d(nn.Module):
    """mmcv NonLocal2d, embedded-gaussian mode (the BFP config:
    reduction=1, use_scale=False): theta/phi/g 1x1 convs, softmax affinity
    over all positions, zero-init conv_out back to C, residual."""

    reduction: int = 1
    use_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        n, h, w, c = x.shape
        ci = max(c // self.reduction, 1)
        theta = nn.Conv(ci, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(ci, (1, 1), dtype=self.dtype, name="phi")(x)
        g = nn.Conv(ci, (1, 1), dtype=self.dtype, name="g")(x)
        theta = theta.reshape(n, h * w, ci).astype(jnp.float32)
        phi = phi.reshape(n, h * w, ci).astype(jnp.float32)
        g = g.reshape(n, h * w, ci).astype(jnp.float32)
        logits = jnp.einsum("nqc,nkc->nqk", theta, phi)
        if self.use_scale:
            logits = logits / jnp.sqrt(float(ci))
        attn = jax.nn.softmax(logits, axis=-1)
        y = jnp.einsum("nqk,nkc->nqc", attn, g).reshape(n, h, w, ci)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_out")(
            y.astype(self.dtype))
        out = x + y.astype(x.dtype)
        return out[0] if squeeze else out


class BFP(nn.Module):
    """Balanced Feature Pyramid (bfp.py:10, Libra R-CNN): gather all levels
    to the refine level (adaptive max-pool down / nearest up), average,
    refine with a REAL non-local block (the libra config's
    refine_type='non_local') or a 3x3 conv, then scatter back residually
    (nearest up / max-pool down — bfp.py:75-103)."""

    out_channels: int = 256
    refine_level: int = 2
    refine_type: Optional[str] = "non_local"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        ref_hw = inputs[self.refine_level].shape[-3:-1]

        def down(x, hw):
            ry = max(x.shape[-3] // hw[0], 1)
            rx = max(x.shape[-2] // hw[1], 1)
            x = nn.max_pool(x, (ry, rx), strides=(ry, rx))
            if x.shape[-3:-1] != tuple(hw):  # odd-size guard
                x = _resize_to(x, hw)
            return x

        gathered = []
        for i, x in enumerate(inputs):
            x = x.astype(self.dtype)
            if i < self.refine_level:
                x = down(x, ref_hw)
            elif i > self.refine_level:
                x = _resize_to(x, ref_hw)
            gathered.append(x)
        bsf = sum(gathered) / len(gathered)
        if self.refine_type == "non_local":
            bsf = NonLocal2d(dtype=self.dtype, name="refine")(bsf)
        elif self.refine_type == "conv":
            bsf = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name="refine")(bsf)
        outs = []
        for i, x in enumerate(inputs):
            hw = x.shape[-3:-1]
            res = _resize_to(bsf, hw) if i <= self.refine_level \
                else down(bsf, hw)
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
    """Feature Pyramid Grid — the reference's full pathway set (fpg.py:100
    + configs/fpg/faster_rcnn_r50_fpg_crop640_50e_coco.py):

    - ``paths``: one 'bu'/'td' direction per stack (shipped config:
      9 bottom-up stacks);
    - per (stack, level) transitions: ``same_up`` (pre-act 3x3 stride-2
      conv from the previous level of the SAME stack, bottom-up),
      ``across_lateral`` (pre-act 1x1 conv of the previous stack's same
      level), ``across_down`` (UpInterpolationConv: nearest 2x upsample
      then pre-act 3x3 conv of the previous stack's coarser level), and
      ``across_skip`` (pre-act 1x1 conv from the INITIAL laterals);
      ``same_down``/``across_up`` are None in the shipped config;
    - ``skip_inds[j]``: stacks where level j passes through unchanged
      (the staircase ((0,1,2,3), (0,1,2), (0,1), (0,), ()));
    - output: pre-act 3x3 ``last_conv`` on the final stack per level.

    Pre-act = ConvModule order ('act', 'conv', 'norm'); norm here is the
    frozen-affine BN used framework-wide.
    """

    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    paths: Tuple[str, ...] = ("bu",) * 9
    skip_inds: Tuple[Tuple[int, ...], ...] = (
        (0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())
    dtype: Any = jnp.bfloat16

    def _trans(self, x, name, kernel=1, stride=1, upsample=None):
        """Pre-activation ConvModule: relu -> conv -> frozen BN, with the
        UpInterpolationConv variant interpolating (nearest, to the target
        level's size — odd pyramids make a fixed 2x over/undershoot) before
        the module."""
        from ..backbones.resnet import FrozenBatchNorm

        if upsample is not None:
            x = _resize_to(x, upsample)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (kernel, kernel),
                    strides=(stride, stride),
                    padding=[((kernel - 1) // 2, (kernel - 1) // 2)] * 2,
                    use_bias=False, dtype=self.dtype, name=name + "_conv")(x)
        return FrozenBatchNorm(dtype=self.dtype, name=name + "_bn")(x)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        paths = self.paths if len(self.paths) == self.stack_times \
            else ("bu",) * self.stack_times
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x.astype(self.dtype))
            for i, x in enumerate(inputs)
        ]
        # extra levels: MaxPool2d(1, stride 2) (fpg.py:231 default)
        while len(feats) < self.num_outs:
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))
        n = self.num_outs

        outs = [feats]
        for s_i, direction in enumerate(paths):
            cur = outs[-1]
            nxt = []
            for j in range(n):
                # skip check keyed by the LOOP index j (fpg.py:343), the
                # computed level by the direction-dependent lvl
                if s_i in self.skip_inds[j]:
                    nxt.append(cur[j])
                    continue
                lvl = n - j - 1 if direction == "td" else j
                acc = self._trans(cur[lvl], f"s{s_i}_l{lvl}_lateral",
                                  kernel=1)
                if direction == "bu" and lvl > 0:
                    su = self._trans(nxt[-1], f"s{s_i}_l{lvl}_same_up",
                                     kernel=3, stride=2)
                    if su.shape[-3:-1] != acc.shape[-3:-1]:
                        su = _resize_to(su, acc.shape[-3:-1])  # odd sizes
                    acc = acc + su
                if lvl < n - 1:
                    acc = acc + self._trans(
                        cur[lvl + 1], f"s{s_i}_l{lvl}_across_down",
                        kernel=3, upsample=acc.shape[-3:-1])
                acc = acc + self._trans(outs[0][lvl],
                                        f"s{s_i}_l{lvl}_across_skip",
                                        kernel=1)
                nxt.append(acc)
            outs.append(nxt[::-1] if direction == "td" else nxt)

        return tuple(
            self._trans(outs[-1][i], f"out{i}", kernel=3)
            for i in range(n))


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
