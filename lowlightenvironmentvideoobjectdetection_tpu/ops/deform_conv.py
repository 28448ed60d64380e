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


def modulated_deform_conv_windowed(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kernel_size: int = 3,
    deform_groups: int = 1,
    radius: int = 3,
) -> jnp.ndarray:
    """Gather-FREE DCNv2: the TPU speed-of-light formulation.

    The bilinear sample at ``p + base_k + Δ_k(p)`` equals a sum over the
    integer displacements d of hat-function weights
    ``max(0, 1-|Δy+base_y-dy|) * max(0, 1-|Δx+base_x-dx|)`` times the
    STATICALLY shifted input ``x[p+d]`` — the hat vanishes except at the
    two integer neighbors per axis, so this is exactly the 4-corner
    bilinear. With offsets clamped to ``[-radius, radius]`` the sum is a
    static (2·radius+3)^2 window per tap: pure VPU fmas over contiguous
    slices of the padded input + one matmul per tap, ZERO gathers.
    Out-of-image corners contribute zero via the zero padding — identical
    boundary semantics to ``dmcn_im2col_bilinear``.

    Structured as a ``lax.scan`` over the K taps (the window unrolled
    inside) so the HLO holds ONE tap body — the fully unrolled form took
    >9 min to compile on the tunnel backend.

    Equal to :func:`modulated_deform_conv` whenever every offset satisfies
    ``|Δ| <= radius`` (golden: tests/test_dcn_golden.py). The TAF
    aggregators' offsets come from a zero-initialized conv and stay small
    throughout training; ``radius`` bounds them like any other
    architectural prior. The gather forms measured 222 ms fwd at the TAF
    stage-1 shape (v5e, 152x252x128 g=8) — gathers serialize on TPU; this
    form runs on the VPU/MXU at full rate.
    """
    h, w, cin = x.shape
    k = kernel_size
    kk = k * k
    g = deform_groups
    cpg = cin // g
    r = radius
    pad = r + 2  # window reach: base (±1) + radius + 1 bilinear neighbor

    dyo = jnp.clip(offset.reshape(h, w, g, 2, kk)[:, :, :, 0, :], -r, r)
    dxo = jnp.clip(offset.reshape(h, w, g, 2, kk)[:, :, :, 1, :], -r, r)
    m = mask.reshape(h, w, g, kk)

    base_y = jnp.asarray([t // k - (k - 1) // 2 for t in range(kk)],
                         jnp.int32)
    base_x = jnp.asarray([t % k - (k - 1) // 2 for t in range(kk)],
                         jnp.int32)
    xpad = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    # group->channel expansion matrix: wfull = wgt @ expand keeps every
    # elementwise op in the [H, W, Cin] 128-lane layout — the
    # reshape-to-[H, W, G, Cpg] formulation ran the window fmas on
    # 16-lane vectors (measured 142 ms fwd at TAF stage-1; this one cuts
    # the per-pass cost ~Cpg-fold)
    expand = (jnp.arange(cin) // cpg == jnp.arange(g)[:, None]
              ).astype(jnp.float32)  # [G, Cin]
    w_taps = weight.reshape(kk, cin, -1)
    cout = w_taps.shape[-1]

    @jax.checkpoint
    def _tap_sample(per_tap):
        """One tap's masked windowed sample — rematerialized in backward:
        saving the [H, W, Cin] per-tap samples across the K-tap scan OOMed
        16G chips (the window recompute is cheap VPU work)."""
        by, bx, sy_off, sx_off, m_t = per_tap
        # sy/sx: fractional sample displacement of this tap, [H, W, G]
        sy = sy_off + by.astype(jnp.float32)
        sx = sx_off + bx.astype(jnp.float32)
        samp = jnp.zeros((h, w, cin), jnp.float32)
        for dyi_rel in range(-r - 1, r + 2):
            for dxi_rel in range(-r - 1, r + 2):
                # shifted slice x[p + (by + dyi_rel, bx + dxi_rel)]
                sh = jax.lax.dynamic_slice(
                    xpad, (pad + by + dyi_rel, pad + bx + dxi_rel, 0),
                    (h, w, cin))
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(sy - (by + dyi_rel)))
                wx = jnp.maximum(
                    0.0, 1.0 - jnp.abs(sx - (bx + dxi_rel)))
                wgt = wy * wx  # [H, W, G]
                if g == 1:
                    samp = samp + sh * wgt[:, :, 0, None]
                else:
                    wfull = jax.lax.dot_general(
                        wgt, expand, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    samp = samp + sh * wfull
        if g == 1:
            samp = samp * m_t[:, :, 0, None]
        else:
            mfull = jax.lax.dot_general(
                m_t, expand, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            samp = samp * mfull
        return samp

    def tap_body(acc, per_tap):
        *sample_args, w_t = per_tap
        samp = _tap_sample(tuple(sample_args))
        out_t = jax.lax.dot_general(
            samp.reshape(h * w, cin), w_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + out_t, None

    acc0 = jnp.zeros((h * w, cout), jnp.float32)
    per_tap = (base_y, base_x,
               jnp.moveaxis(dyo, -1, 0),  # [K, H, W, G]
               jnp.moveaxis(dxo, -1, 0),
               jnp.moveaxis(m, -1, 0),
               w_taps)
    out, _ = jax.lax.scan(tap_body, acc0, per_tap)
    out = out.reshape(h, w, cout)
    if bias is not None:
        out = out + bias
    return out
