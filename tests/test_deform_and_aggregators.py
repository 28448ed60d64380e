"""Tests for DCNv2 and the denoising aggregators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.aggregators.denoising_aggregator import (
    RDB,
    DenoisingAggregator,
    Denoising2Aggregator,
    ModulatedDCNPack,
    TemporalAttentionFusion,
)
from lowlightenvironmentvideoobjectdetection_tpu.ops.deform_conv import (
    modulated_deform_conv,
)


class TestModulatedDeformConv:
    def test_zero_offset_equals_conv(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, (8, 8, 4)).astype(np.float32))
        weight = jnp.asarray(rng.uniform(-1, 1, (3, 3, 4, 6)).astype(np.float32))
        offset = jnp.zeros((8, 8, 2 * 9))
        mask = jnp.ones((8, 8, 9))
        out = modulated_deform_conv(x, offset, mask, weight)
        ref = jax.lax.conv_general_dilated(
            x[None], weight, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_offset_shifts_sampling(self):
        # 1x1 kernel with offset (0, 1): output(y, x) = w * input(y, x+1)
        x = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
        weight = jnp.ones((1, 1, 1, 1))
        offset = jnp.zeros((4, 4, 2)).at[..., 1].set(1.0)  # dx = 1
        mask = jnp.ones((4, 4, 1))
        out = modulated_deform_conv(x, offset, mask, weight, kernel_size=1)
        np.testing.assert_allclose(
            np.asarray(out[:, :-1, 0]), np.asarray(x[:, 1:, 0]), atol=1e-5
        )
        # out-of-bounds column samples zero
        np.testing.assert_allclose(np.asarray(out[:, -1, 0]), 0.0, atol=1e-5)

    def test_mask_scales(self):
        x = jnp.ones((4, 4, 2))
        weight = jnp.ones((1, 1, 2, 1))
        offset = jnp.zeros((4, 4, 2))
        mask = jnp.full((4, 4, 1), 0.5)
        out = modulated_deform_conv(x, offset, mask, weight, kernel_size=1)
        np.testing.assert_allclose(np.asarray(out), 1.0)  # 2 channels * 0.5

    def test_deform_groups(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(-1, 1, (6, 6, 8)).astype(np.float32))
        weight = jnp.asarray(rng.uniform(-1, 1, (3, 3, 8, 4)).astype(np.float32))
        g = 2
        offset = jnp.zeros((6, 6, g * 2 * 9))
        mask = jnp.ones((6, 6, g * 9))
        out = modulated_deform_conv(x, offset, mask, weight, deform_groups=g)
        ref = jax.lax.conv_general_dilated(
            x[None], weight, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestAggregators:
    def test_rdb_shape_and_residual(self):
        m = RDB(in_channels=16, channel_growth=8, num_layers=2)
        x = jnp.zeros((2, 8, 8, 16))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero in, ~zero out

    def test_dcn_pack_zero_init_is_half_conv(self):
        m = ModulatedDCNPack(out_channels=8, deform_groups=2)
        x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (1, 8, 8, 8)).astype(np.float32))
        extra = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (1, 8, 8, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, extra)
        out = m.apply(params, x, extra)
        # zero-init offset conv -> offsets 0, mask sigmoid(0)=0.5 -> 0.5*conv
        w = params["params"]["weight"]
        b = params["params"]["bias"]
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) * 0.5 + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_taf_shapes(self):
        m = TemporalAttentionFusion(channels=16, mid_channels=8, emb_nums=2)
        x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (3, 8, 8, 16)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_denoising_aggregator(self):
        m = DenoisingAggregator(channels=16, mid_channels=8, rdb_blocks=1,
                                channel_growth=8)
        x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, 8, 8, 16)).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == x.shape

    def test_denoising2_multistage(self):
        m = Denoising2Aggregator(
            in_channels=(8, 16), mid_channels=(4, 8), out_channels=(16, 24),
            rdb_blocks=(1, 1), channel_growth=(4, 4), taf_embs=(1, 1),
            downsample=(True, False), with_rdb=(True, True),
            with_taf=(True, True),
        )
        t = 2
        x_noise = (jnp.zeros((t, 16, 16, 8)), jnp.zeros((t, 8, 8, 16)))
        all_x = (jnp.zeros((t, 8, 8, 24)),)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x_noise, all_x)
        stages, necks = m.apply(params, x_noise, all_x)
        assert stages[0].shape == x_noise[0].shape
        assert stages[1].shape == x_noise[1].shape
        assert necks[0].shape == all_x[0].shape
