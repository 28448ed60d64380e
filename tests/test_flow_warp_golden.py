"""flow_warp_feats / grid_sample goldens against real torch ops.

The torch side runs the reference's actual pipeline
(mmtracking/mmtrack/core/motion/flow.py:4-41) with ``F.interpolate`` +
``F.grid_sample`` — the exact ATen kernels the reference executes — so this
pins the parity path bit-for-bit: width-derived scalar resize factor,
border-clamped bilinear flow resize, ``x / W * 2 - 1`` normalization sampled
with align_corners=True + border padding.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp
import torch.nn.functional as F

from lowlightenvironmentvideoobjectdetection_tpu.ops.grid_sample import (
    flow_warp_feats,
    grid_sample,
)


def _torch_flow_warp(x, flow):
    """Transcription of flow.py:4-41 (NCHW, batch 1)."""
    scale_factor = float(x.shape[-1]) / flow.shape[-1]
    flow = F.interpolate(
        flow, scale_factor=scale_factor, mode="bilinear", align_corners=False
    )
    flow = flow * scale_factor
    H, W = x.shape[-2:]
    h_grid, w_grid = torch.meshgrid(
        torch.arange(H), torch.arange(W), indexing="ij"
    )
    h_grid = h_grid.float()[None, None]
    w_grid = w_grid.float()[None, None]
    grid = torch.cat((w_grid, h_grid), dim=1) + flow
    grid[:, 0] = grid[:, 0] / W * 2 - 1
    grid[:, 1] = grid[:, 1] / H * 2 - 1
    grid = grid.permute(0, 2, 3, 1)
    return F.grid_sample(x, grid, padding_mode="border", align_corners=True)


@pytest.mark.parametrize("seed,fh,fw,h,w", [(0, 6, 8, 12, 16), (1, 5, 7, 15, 21)])
def test_flow_warp_matches_torch_reference_pipeline(seed, fh, fw, h, w):
    rng = np.random.RandomState(seed)
    feat = rng.randn(h, w, 5).astype(np.float32)
    # large displacements so border clamping + the (W-1)/W shrink both engage
    flow = (rng.randn(fh, fw, 2) * 3.0).astype(np.float32)

    got = np.asarray(jax.jit(flow_warp_feats)(jnp.asarray(feat), jnp.asarray(flow)))

    tx = torch.from_numpy(feat).permute(2, 0, 1)[None]
    tf = torch.from_numpy(flow).permute(2, 0, 1)[None]
    want = _torch_flow_warp(tx, tf)[0].permute(1, 2, 0).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode):
    rng = np.random.RandomState(2)
    feat = rng.randn(9, 7, 3).astype(np.float32)
    # include in-range, boundary-straddling, and far-outside samples
    grid = (rng.rand(11, 13, 2).astype(np.float32) * 3.0) - 1.5

    got = np.asarray(
        grid_sample(jnp.asarray(feat), jnp.asarray(grid),
                    align_corners=align_corners, padding_mode=padding_mode)
    )
    want = F.grid_sample(
        torch.from_numpy(feat).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
