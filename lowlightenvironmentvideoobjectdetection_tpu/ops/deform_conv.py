"""Modulated deformable convolution (DCNv2) on TPU.

Replaces the mmcv native ``modulated_deform_conv2d`` kernel used throughout
the reference's denoising stack (mmtrack/models/aggregators/
denoising_aggregator.py:71-114, denoising2_aggregator.py ModulatedDCNPack,
backbones resnet_A..E plugins) with an XLA formulation:

  per output pixel p and kernel tap k: bilinear-gather x at
  (p + p_k + Δp_k(p)), scale by the sigmoid mask m_k(p), then contract the
  [K, Cin] samples with the [K, Cin, Cout] weight on the MXU.

NHWC layout; offset channels are laid out per deform group as [all-K dy,
then all-K dx] — the same *learned* packing freedom the reference's
ModulatedDCNPack exploits (denoising_aggregator.py:107-109 chunks its offset
conv into thirds and concatenates, so the dy/dx channel assignment is
whatever the zero-initialized conv_offset learns; only internal consistency
matters).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def modulated_deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kernel_size: int = 3,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """x: [H, W, Cin]; offset: [H, W, G*2K] (per group: K dy then K dx);
    mask: [H, W, G*K] (already sigmoided); weight: [kh, kw, Cin, Cout].
    Stride 1, 'same' padding, dilation 1 (the configuration every reference
    use-site employs). Returns [H, W, Cout].
    """
    h, w, cin = x.shape
    k = kernel_size
    kk = k * k
    g = deform_groups
    cpg = cin // g

    # base tap displacements (ky, kx), row-major as mmcv
    ky, kx = jnp.meshgrid(
        jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
        jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
        indexing="ij",
    )
    base_y = ky.reshape(-1)  # [K]
    base_x = kx.reshape(-1)

    off = offset.reshape(h, w, g, 2, kk)  # mmcv layout: (o1, o2) = (dy, dx)
    dy = off[:, :, :, 0, :]
    dx = off[:, :, :, 1, :]
    m = mask.reshape(h, w, g, kk)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None, None, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :, None, None]
    sy = gy + base_y[None, None, None, :] + dy  # [H, W, G, K]
    sx = gx + base_x[None, None, None, :] + dx

    # bilinear gather with zero padding outside; per-TAP accumulation keeps
    # the live intermediate at [H, W, Cin] instead of [H, W, K, Cin] (9x
    # smaller — the K-materializing variant OOMs 16GB chips during full-res
    # aggregator training)
    def sample_group(xg, sy_k, sx_k, m_k):
        """xg: [H, W, Cpg]; sy_k/sx_k/m_k: [H, W] -> [H, W, Cpg].

        Exact mmcv ``dmcn_im2col_bilinear`` boundary semantics: each of the
        four corner taps contributes only if it lies inside the map, so a
        fractionally-outside sample fades bilinearly to zero (clipping the
        coordinate first would give the edge row/column full weight).
        """
        y0 = jnp.floor(sy_k)
        x0 = jnp.floor(sx_k)
        y1 = y0 + 1
        x1 = x0 + 1
        ly = sy_k - y0
        lx = sx_k - x0
        flat = xg.reshape(h * w, -1)

        def corner(yi, xi, wgt):
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0.0, h - 1.0)
            xc = jnp.clip(xi, 0.0, w - 1.0)
            v = flat[(yc * w + xc).astype(jnp.int32)]
            return v * (wgt * ok)[..., None]

        val = (
            corner(y0, x0, (1 - ly) * (1 - lx))
            + corner(y0, x1, (1 - ly) * lx)
            + corner(y1, x0, ly * (1 - lx))
            + corner(y1, x1, ly * lx)
        )
        return val * (m_k[..., None])

    w_mat = weight.reshape(kk, cin, -1)  # [K, Cin, Cout]

    def tap_body(acc, per_tap):
        sy_k, sx_k, m_k, w_k = per_tap  # [H,W,G], [H,W,G], [H,W,G], [Cin,Cout]
        taps = []
        for gi in range(g):
            xg = x[..., gi * cpg:(gi + 1) * cpg]
            taps.append(sample_group(
                xg, sy_k[:, :, gi], sx_k[:, :, gi], m_k[:, :, gi]))
        tap = jnp.concatenate(taps, axis=-1) if g > 1 else taps[0]
        return acc + jnp.einsum("hwc,co->hwo", tap, w_k,
                                preferred_element_type=jnp.float32), None

    # scan over the K taps: same math as an unrolled loop but the HLO holds
    # ONE tap body instead of K copies — the unrolled form made the full-res
    # aggregator training graph take >30 min to compile
    out0 = jnp.zeros((h, w, w_mat.shape[-1]), jnp.float32)
    per_tap = (
        jnp.moveaxis(sy, -1, 0),  # [K, H, W, G]
        jnp.moveaxis(sx, -1, 0),
        jnp.moveaxis(m, -1, 0),
        w_mat,
    )
    out, _ = jax.lax.scan(tap_body, out0, per_tap)
    if bias is not None:
        out = out + bias
    return out


def deform_conv(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kernel_size: int = 3,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """Plain (un-modulated) DeformConv2d — DCNv1.

    The reference uses mmcv's ``DeformConv2d`` in the guided-anchoring,
    RepPoints, VFNet-star and FoveaBox-align heads
    (mmdet/models/dense_heads/guided_anchor_head.py:4, reppoints_head.py,
    vfnet_head.py, fovea_head.py FeatureAlign). Identical sampling math to
    DCNv2 with every modulation mask fixed at 1.
    """
    h, w, _ = x.shape
    kk = kernel_size * kernel_size
    ones = jnp.ones((h, w, deform_groups * kk), x.dtype)
    return modulated_deform_conv(
        x, offset, ones, weight, bias,
        kernel_size=kernel_size, deform_groups=deform_groups,
    )


def modulated_deform_conv_fused(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kernel_size: int = 3,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """Same math as :func:`modulated_deform_conv`, reorganized for TPU:

    - ONE batched gather per bilinear corner (vmapped over the deform
      groups, taps folded into the gather index) instead of the scan's
      4 x K x G small sequential gathers;
    - the K tap matmuls fused into a single [HW, K*Cin] x [K*Cin, Cout]
      MXU contraction (K*Cin is MXU-shaped; the scan's per-tap [Cin, Cout]
      matmuls each re-read the accumulator from HBM).

    Materializes the [HW, K, Cin] column tensor (im2col) — fine at the
    aggregator's stage shapes; the scan form remains for memory-tight
    full-resolution use.
    """
    h, w, cin = x.shape
    k = kernel_size
    kk = k * k
    g = deform_groups
    cpg = cin // g

    ky, kx = jnp.meshgrid(
        jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
        jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
        indexing="ij",
    )
    off = offset.reshape(h, w, g, 2, kk)
    m = mask.reshape(h * w, g, kk)
    gy = jnp.arange(h, dtype=jnp.float32)[:, None, None, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :, None, None]
    sy = (gy + ky.reshape(-1)[None, None, None, :] + off[:, :, :, 0, :]
          ).reshape(h * w, g, kk)
    sx = (gx + kx.reshape(-1)[None, None, None, :] + off[:, :, :, 1, :]
          ).reshape(h * w, g, kk)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ly = sy - y0
    lx = sx - x0

    xg = jnp.transpose(x.reshape(h * w, g, cpg), (1, 0, 2))  # [G, HW, Cpg]

    def corner(yi, xi, wgt):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = (jnp.clip(yi, 0.0, h - 1.0) * w
               + jnp.clip(xi, 0.0, w - 1.0)).astype(jnp.int32)
        # [HW, G, K] indices -> [G, HW*K] batched gather over groups
        ixg = jnp.transpose(idx, (1, 0, 2)).reshape(g, -1)
        vals = jax.vmap(lambda op, ix: op[ix])(xg, ixg)  # [G, HW*K, Cpg]
        vals = vals.reshape(g, h * w, kk, cpg)
        wm = jnp.transpose((wgt * ok), (1, 0, 2))[..., None]  # [G, HW, K, 1]
        return vals * wm

    col = (corner(y0, x0, (1 - ly) * (1 - lx))
           + corner(y0, x0 + 1, (1 - ly) * lx)
           + corner(y0 + 1, x0, ly * (1 - lx))
           + corner(y0 + 1, x0 + 1, ly * lx))  # [G, HW, K, Cpg]
    col = col * jnp.transpose(m, (1, 0, 2))[..., None]
    # -> [HW, K, G, Cpg] == [HW, K, Cin] in the weight's channel order
    col = jnp.transpose(col, (1, 2, 0, 3)).reshape(h * w, kk * cin)
    w_mat = weight.reshape(kk * cin, -1)
    out = jax.lax.dot_general(
        col, w_mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(h, w, -1)
    if bias is not None:
        out = out + bias
    return out
