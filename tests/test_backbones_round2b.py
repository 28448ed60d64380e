"""Smoke tests for ResNeSt, DetectoRS (SAC + RFP), TridentNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


def _img(hw=64):
    return jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (1, hw, hw, 3)), jnp.float32)


class TestResNeSt:
    def test_shapes(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnest import (
            ResNeSt,
        )

        m = ResNeSt(depth=50, dtype=jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(p, _img())
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]

    def test_splat_attention_sums_to_one(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnest import (
            SplAtConv,
        )

        m = SplAtConv(channels=16, radix=2, dtype=jnp.float32)
        # input channels must be divisible by radix (grouped conv) — inside
        # the block, conv1 guarantees that
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16),
                        jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(m.apply)(p, x)
        assert out.shape == (1, 16, 16, 16)


class TestDetectoRS:
    def test_sac_backbone(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.detectors_trident import (
            DetectoRSResNet,
        )

        m = DetectoRSResNet(dtype=jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(p, _img())
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]

    def test_rfp_two_steps(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.detectors_trident import (
            RFP,
        )

        m = RFP(rfp_steps=2, out_channels=64, dtype=jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(p, _img())
        assert len(outs) == 5
        assert outs[0].shape[-1] == 64
        # feedback adapters exist (second unrolled step is real)
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        assert any("rfp_conv" in jax.tree_util.keystr(path)
                   for path, _ in flat)


class TestTrident:
    def test_three_branches_share_weights(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.detectors_trident import (
            TridentResNet,
        )

        m = TridentResNet(num_trident_blocks=2, dtype=jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        out = jax.jit(m.apply)(p, _img())
        assert out.shape[0] == 3  # 3 dilation branches
        # branches differ (different dilations) despite shared weights
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[2]))

        m_test = TridentResNet(num_trident_blocks=2, test_mode=True,
                               dtype=jnp.float32)
        single = jax.jit(m_test.apply)(p, _img())
        np.testing.assert_allclose(np.asarray(single), np.asarray(out[1]),
                                   rtol=1e-5)
