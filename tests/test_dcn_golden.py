"""DCNv2 bilinear-sampling golden vs an independent numpy transcription.

The transcription implements mmcv's ``modulated_deformable_im2col`` semantics
(mmcv modulated_deform_conv CUDA kernel, used by the reference through
denoising_aggregator.py ModulatedDCNPack and the resnet_A..E plugins) with
plain python loops:

  for each output pixel p, deform group g, tap (i, j):
    sample = bilinear(x_g, p + (i, j) - center + (dy, dx))   # per-CORNER
             zero outside (a fractionally-outside sample fades to zero —
             corners outside the map contribute nothing)
    col    = sample * mask
  out[p]  = sum_k col_k @ W_k + b

Random fractional offsets are drawn wide enough (±3) to push samples across
the map border, which is exactly where coordinate-clipping implementations
diverge from mmcv.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.ops.deform_conv import (
    deform_conv,
    modulated_deform_conv,
)


def _np_bilinear(img, y, x):
    """img [H, W, C]; mmcv dmcn_im2col_bilinear: per-corner zero outside."""
    h, w, c = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = np.zeros(c, np.float64)
    for yi, wy in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
        for xi, wx in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
            if 0 <= yi < h and 0 <= xi < w:
                out += img[yi, xi] * (wy * wx)
    return out


def _np_mdcn(x, offset, mask, weight, bias, k=3, g=1):
    """Loop transcription. offset [H, W, G*2K] (per group: K dy then K dx)."""
    h, w, cin = x.shape
    cout = weight.shape[-1]
    kk = k * k
    cpg = cin // g
    out = np.zeros((h, w, cout), np.float64)
    off = offset.reshape(h, w, g, 2, kk)
    msk = mask.reshape(h, w, g, kk)
    wk = weight.reshape(kk, cin, cout)
    ctr = (k - 1) / 2
    for py in range(h):
        for px in range(w):
            col = np.zeros(cin, np.float64)
            acc = np.zeros(cout, np.float64)
            for t in range(kk):
                ky, kx = divmod(t, k)
                for gi in range(g):
                    sy = py + ky - ctr + off[py, px, gi, 0, t]
                    sx = px + kx - ctr + off[py, px, gi, 1, t]
                    s = _np_bilinear(x[:, :, gi * cpg:(gi + 1) * cpg], sy, sx)
                    col[gi * cpg:(gi + 1) * cpg] = s * msk[py, px, gi, t]
                acc += col @ wk[t]
            out[py, px] = acc + (bias if bias is not None else 0.0)
    return out.astype(np.float32)


class TestDCNv2Golden:
    @pytest.mark.parametrize("seed,g", [(0, 1), (1, 1), (2, 2)])
    def test_matches_numpy_transcription(self, seed, g):
        rs = np.random.RandomState(seed)
        h, w, cin, cout, k = 6, 5, 4, 3, 3
        x = rs.randn(h, w, cin).astype(np.float32)
        # wide offsets: many samples land across/outside the border
        offset = (rs.randn(h, w, g * 2 * k * k) * 3.0).astype(np.float32)
        mask = rs.uniform(0, 1, (h, w, g * k * k)).astype(np.float32)
        weight = rs.randn(k, k, cin, cout).astype(np.float32)
        bias = rs.randn(cout).astype(np.float32)

        got = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), kernel_size=k,
            deform_groups=g))
        want = _np_mdcn(x, offset, mask, weight, bias, k=k, g=g)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_dcnv1_is_mask_one(self):
        rs = np.random.RandomState(3)
        h, w, cin, cout, k = 5, 5, 2, 2, 3
        x = rs.randn(h, w, cin).astype(np.float32)
        offset = (rs.randn(h, w, 2 * k * k) * 2.0).astype(np.float32)
        weight = rs.randn(k, k, cin, cout).astype(np.float32)
        got = np.asarray(deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                     jnp.asarray(weight), kernel_size=k))
        want = _np_mdcn(x, offset, np.ones((h, w, k * k), np.float32),
                        weight, None, k=k, g=1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_fractional_edge_sample_fades(self):
        """A sample at y=-0.5 must contribute HALF of row 0, not all of it
        (regression for coordinate-clipping boundary semantics)."""
        h = w = 3
        cin = cout = 1
        x = np.ones((h, w, 1), np.float32)
        weight = np.zeros((3, 3, 1, 1), np.float32)
        weight[1, 1, 0, 0] = 1.0  # only the center tap
        offset = np.zeros((h, w, 18), np.float32)
        offset[0, 1, 4] = -0.5  # center tap dy at pixel (0,1): sample y=-0.5
        mask = np.ones((h, w, 9), np.float32)
        out = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight)))
        np.testing.assert_allclose(out[0, 1, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(out[0, 0, 0], 1.0, atol=1e-6)


class TestFusedVariant:
    """The TPU-fused DCNv2 (one batched gather per corner + single im2col
    MXU matmul) must match the scan-gather reference formulation exactly
    (VERDICT r4 #3 — the flagship TAF's hot op)."""

    @pytest.mark.parametrize("seed,g", [(0, 1), (1, 4), (2, 8)])
    def test_fused_matches_scan(self, seed, g):
        from lowlightenvironmentvideoobjectdetection_tpu.ops.deform_conv import (
            modulated_deform_conv, modulated_deform_conv_fused,
        )

        rs = np.random.RandomState(seed)
        h, w, cin, cout, k = 9, 11, 16, 8, 3
        x = jnp.asarray(rs.randn(h, w, cin).astype(np.float32))
        off = jnp.asarray((rs.randn(h, w, g * 2 * k * k) * 3
                           ).astype(np.float32))
        m = jnp.asarray(rs.uniform(0, 1, (h, w, g * k * k)
                                   ).astype(np.float32))
        wt = jnp.asarray(rs.randn(k, k, cin, cout).astype(np.float32))
        b = jnp.asarray(rs.randn(cout).astype(np.float32))
        a = modulated_deform_conv(x, off, m, wt, b, deform_groups=g)
        c = modulated_deform_conv_fused(x, off, m, wt, b, deform_groups=g)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


class TestWindowedVariant:
    """The gather-free windowed-hat DCNv2 equals the exact gather form
    whenever |offset| <= radius (the TAF training configuration — offsets
    come from a zero-init conv and stay small)."""

    @pytest.mark.parametrize("seed,g,r", [(0, 1, 3), (1, 4, 3), (2, 8, 2)])
    def test_windowed_matches_scan_within_radius(self, seed, g, r):
        from lowlightenvironmentvideoobjectdetection_tpu.ops.deform_conv import (
            modulated_deform_conv, modulated_deform_conv_windowed,
        )

        rs = np.random.RandomState(seed)
        h, w, cin, cout, k = 9, 11, 16, 8, 3
        x = jnp.asarray(rs.randn(h, w, cin).astype(np.float32))
        off = jnp.asarray(np.clip(rs.randn(h, w, g * 2 * k * k) * 1.5,
                                  -r, r).astype(np.float32))
        m = jnp.asarray(rs.uniform(0, 1, (h, w, g * k * k)
                                   ).astype(np.float32))
        wt = jnp.asarray(rs.randn(k, k, cin, cout).astype(np.float32))
        b = jnp.asarray(rs.randn(cout).astype(np.float32))
        a = modulated_deform_conv(x, off, m, wt, b, deform_groups=g)
        c = modulated_deform_conv_windowed(x, off, m, wt, b,
                                           deform_groups=g, radius=r)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)

    def test_out_of_window_offsets_clamp(self):
        """Offsets beyond the radius saturate at the window edge (the
        documented semantic difference from the unbounded gather form)."""
        from lowlightenvironmentvideoobjectdetection_tpu.ops.deform_conv import (
            modulated_deform_conv, modulated_deform_conv_windowed,
        )

        rs = np.random.RandomState(3)
        h, w, cin, cout, k, r = 9, 11, 8, 4, 3, 2
        x = jnp.asarray(rs.randn(h, w, cin).astype(np.float32))
        big = jnp.asarray(np.full((h, w, 2 * k * k), 5.0, np.float32))
        clamped = jnp.asarray(np.full((h, w, 2 * k * k), float(r),
                                      np.float32))
        m = jnp.asarray(np.ones((h, w, k * k), np.float32))
        wt = jnp.asarray(rs.randn(k, k, cin, cout).astype(np.float32))
        got = modulated_deform_conv_windowed(x, big, m, wt, radius=r)
        want = modulated_deform_conv(x, clamped, m, wt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
