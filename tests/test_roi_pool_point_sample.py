"""ops/roi_pool + ops/point_sample + masked_conv2d (SURVEY §2.9 last rows)."""

import jax
import jax.numpy as jnp
import numpy as np

from lowlightenvironmentvideoobjectdetection_tpu.ops.point_sample import (
    masked_conv2d,
    point_sample,
)
from lowlightenvironmentvideoobjectdetection_tpu.ops.roi_pool import roi_pool


def test_roi_pool_constant_region():
    # constant feature -> every pooled bin equals the constant
    feat = jnp.full((16, 16, 3), 2.5)
    rois = jnp.asarray([[8.0, 8.0, 120.0, 120.0]])  # image coords, scale 1/16
    out = roi_pool(feat, rois, output_size=7, spatial_scale=1.0 / 16.0)
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)


def test_roi_pool_max_semantics():
    # a single hot pixel inside the roi must dominate the bin containing it
    feat = jnp.zeros((16, 16, 1)).at[8, 8, 0].set(10.0)
    rois = jnp.asarray([[0.0, 0.0, 255.0, 255.0]])  # whole map at scale 1/16
    out = roi_pool(feat, rois, output_size=4, spatial_scale=1.0 / 16.0,
                   sampling_ratio=8)
    m = np.asarray(out)[0, :, :, 0]
    assert m.max() > 5.0  # hot pixel found by dense sampling
    assert (m > 5.0).sum() <= 4  # and localized, not smeared everywhere


def test_roi_pool_jits():
    feat = jnp.ones((8, 8, 2))
    rois = jnp.asarray([[0.0, 0.0, 64.0, 64.0], [16.0, 16.0, 48.0, 48.0]])
    out = jax.jit(lambda f, r: roi_pool(f, r, output_size=3,
                                        spatial_scale=1.0 / 8.0))(feat, rois)
    assert out.shape == (2, 3, 3, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_point_sample_bilinear_exact():
    # linear ramp in x: sampling is exact under bilinear interpolation
    h = w = 9
    xs = jnp.arange(w, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, :, None], (h, w, 1))
    # mmcv convention: points normalized to [0, 1]
    pts = jnp.asarray([[0.5, 0.5], [0.25, 0.75]])
    out = point_sample(feat, pts)
    # x_pix = ((2p-1+1) * W - 1) / 2 = p*W - .5
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               [0.5 * w - 0.5, 0.25 * w - 0.5], atol=1e-5)


def test_masked_conv_matches_dense_on_kept_positions():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))

    def conv(z):
        return jax.lax.conv_general_dilated(
            z[None], w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    mask = jnp.asarray(rng.rand(8, 8) > 0.5)
    out = masked_conv2d(conv, x, mask)
    dense = conv(x)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(dense)[m],
                               rtol=1e-5)
    assert np.all(np.asarray(out)[~m] == 0)
