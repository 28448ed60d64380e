"""Tests for RoIAlign and grid_sample against analytic golden values.

The feature map f(y, x) = y*W + x is linear in coordinates, so bilinear
interpolation is exact and every RoIAlign bin average equals f evaluated at
the bin's mean sample position — golden values computed analytically, not by
running reference code.
"""

import jax.numpy as jnp
import numpy as np

from lowlightenvironmentvideoobjectdetection_tpu.ops.grid_sample import (
    flow_warp_feats,
    grid_sample,
)
from lowlightenvironmentvideoobjectdetection_tpu.ops.roi_align import roi_align


def linear_feat(h, w, c=1):
    f = np.arange(h * w, dtype=np.float32).reshape(h, w)
    return jnp.asarray(np.repeat(f[..., None], c, axis=-1))


class TestRoIAlign:
    def test_linear_field_exact(self):
        h, w = 16, 16
        feat = linear_feat(h, w)
        # roi in image coords (scale 1), interior so no clamping
        roi = jnp.array([[2.0, 4.0, 10.0, 12.0]])
        out = roi_align(feat, roi, spatial_scale=1.0, out_size=4, sampling_ratio=2)
        # aligned: start = coord - .5; bin size = 8/4 = 2
        # bin (i, j) mean sample pos: y = 4-.5 + (i+.5)*2 ; x = 2-.5 + (j+.5)*2
        for i in range(4):
            for j in range(4):
                y = 3.5 + (i + 0.5) * 2
                x = 1.5 + (j + 0.5) * 2
                expected = y * w + x
                np.testing.assert_allclose(out[0, i, j, 0], expected, rtol=1e-5)

    def test_spatial_scale(self):
        feat = linear_feat(8, 8)
        # roi given in image coords at stride 16 -> feature coords / 16
        roi = jnp.array([[32.0, 32.0, 96.0, 96.0]])
        out = roi_align(feat, roi, spatial_scale=1.0 / 16, out_size=2, sampling_ratio=2)
        for i in range(2):
            for j in range(2):
                y = 2 - 0.5 + (i + 0.5) * 2
                x = 2 - 0.5 + (j + 0.5) * 2
                np.testing.assert_allclose(out[0, i, j, 0], y * 8 + x, rtol=1e-5)

    def test_batched_no_seam_bleed(self):
        # two images: zeros and a constant-100 map; a roi at the very bottom
        # of image 0 must not read rows of image 1.
        f0 = jnp.zeros((8, 8, 1))
        f1 = jnp.full((8, 8, 1), 100.0)
        feats = jnp.stack([f0, f1])
        roi = jnp.array([[0.0, 6.0, 8.0, 8.0]])
        out = roi_align(
            feats, roi, spatial_scale=1.0, batch_inds=jnp.array([0], jnp.int32),
            out_size=2, sampling_ratio=2,
        )
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_chunk_padding(self):
        feat = linear_feat(8, 8)
        rois = jnp.tile(jnp.array([[1.0, 1.0, 5.0, 5.0]]), (5, 1))
        a = roi_align(feat, rois, 1.0, out_size=2, chunk=4)
        assert a.shape == (5, 2, 2, 1)
        np.testing.assert_allclose(a[0], a[4], rtol=1e-6)


class TestGridSample:
    def test_identity_grid(self):
        h, w = 6, 8
        feat = linear_feat(h, w)
        xs = (jnp.arange(w) + 0.5) / w * 2 - 1
        ys = (jnp.arange(h) + 0.5) / h * 2 - 1
        gx, gy = jnp.meshgrid(xs, ys)
        grid = jnp.stack([gx, gy], axis=-1)
        out = grid_sample(feat, grid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-4)

    def test_zero_padding_outside(self):
        feat = jnp.ones((4, 4, 1))
        grid = jnp.full((2, 2, 2), -3.0)  # far outside
        out = grid_sample(feat, grid)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_flow_warp_zero_flow_centered(self):
        feat = linear_feat(8, 8, c=4)
        flow = jnp.zeros((8, 8, 2))
        out = flow_warp_feats(feat, flow, centered=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-3)

    def test_flow_warp_shift_centered(self):
        # flow of +1 px in x means output(y, x) = input(y, x+1)
        feat = linear_feat(8, 8)
        flow = jnp.zeros((8, 8, 2)).at[..., 0].set(1.0)
        out = flow_warp_feats(feat, flow, centered=True)
        np.testing.assert_allclose(
            np.asarray(out[:, :-1, 0]), np.asarray(feat[:, 1:, 0]), atol=1e-3
        )
