"""CARAFE reassembly golden vs a numpy loop transcription of the mmcv kernel.

Reference semantics (mmcv CARAFE CUDA, used by the reference's CARAFE-FPN
via mmdetection/mmdet/models/necks/fpn_carafe.py): each upsampled output
pixel (oy, ox) reads the k_up x k_up source neighborhood centered on its
source pixel (oy//scale, ox//scale) with zero padding outside the map, and
contracts it with its own softmaxed k_up^2 mask, window index = ky*k_up+kx
(the CUDA kernel's row-major window iteration).

The numpy side is a direct per-pixel loop — independent of the
extract_patches + einsum formulation under test. The CARAFEPack
kernel-prediction channel grouping (pixel-shuffle order) is a learned
permutation of conv channels, so only the reassembly op carries
cross-implementation semantics.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.ops.carafe import (
    CARAFEPack,
    carafe,
)


def _np_carafe(x, kernels, k_up, scale):
    h, w, c = x.shape
    ho, wo = h * scale, w * scale
    r = k_up // 2
    out = np.zeros((ho, wo, c), np.float32)
    for oy in range(ho):
        for ox in range(wo):
            sy, sx = oy // scale, ox // scale
            acc = np.zeros(c, np.float32)
            for ky in range(k_up):
                for kx in range(k_up):
                    iy, ix = sy + ky - r, sx + kx - r
                    if 0 <= iy < h and 0 <= ix < w:
                        acc += kernels[oy, ox, ky * k_up + kx] * x[iy, ix]
            out[oy, ox] = acc
    return out


@pytest.mark.parametrize("seed,k_up,scale", [(0, 5, 2), (1, 3, 2), (2, 5, 1)])
def test_carafe_matches_numpy_loop(seed, k_up, scale):
    rng = np.random.RandomState(seed)
    h, w, c = 6, 5, 4
    x = rng.randn(h, w, c).astype(np.float32)
    logits = rng.randn(h * scale, w * scale, k_up * k_up).astype(np.float32)
    kernels = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    got = np.asarray(carafe(jnp.asarray(x), jnp.asarray(kernels), k_up, scale))
    want = _np_carafe(x, kernels, k_up, scale)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_carafe_pack_kernels_are_normalized_and_shapes():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 6, 8).astype(np.float32)
    mod = CARAFEPack(channels=8, scale=2, k_up=5, compressed=16)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(params, jnp.asarray(x))
    assert y.shape == (8, 12, 8)
    assert bool(jnp.isfinite(y).all())
