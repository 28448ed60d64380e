"""Smoke + shape tests for round-2 backbones (ResNeXt/Res2Net/RegNet/HRNet/
Hourglass) and necks (PAFPN/HRFPN/BFP/NASFPN/FPG/CARAFE-FPN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


def _img(hw=64, c=3):
    return jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (1, hw, hw, c)), jnp.float32)


class TestBackbones:
    def test_resnext_grouped_width(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
            ResNeXt,
        )

        m = ResNeXt(depth=50, out_indices=(0, 1, 2, 3), dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(params, _img())
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
        # grouped conv: layer1_0 conv2 kernel has Cin/groups = 128/32 = 4
        k = params["params"]["layer1_0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 4, 128)

    def test_res2net_shapes(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.res2net import (
            Res2Net,
        )

        m = Res2Net(depth=50, out_indices=(0, 1, 2, 3), dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(params, _img())
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
        assert outs[0].shape[1] == 16  # stride 4

    def test_regnet_widths(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.regnet import (
            RegNet, generate_regnet,
        )

        ws, ds, ns = generate_regnet(88, 26.31, 2.25, 25)
        assert ns == 4 and sum(ds) == 25
        m = RegNet(arch="regnetx_400mf", dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(params, _img())
        assert len(outs) == 4
        # strides 4, 8, 16, 32
        assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2

    def test_hrnet_branches(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.hrnet import (
            HRNet,
        )

        m = HRNet(arch="hrnetv2_w18", dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), _img())
        outs = jax.jit(m.apply)(params, _img())
        assert len(outs) == 4
        assert [o.shape[-1] for o in outs] == [18, 36, 72, 144]
        assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2

    def test_hourglass_stacks(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.hourglass import (
            HourglassNet,
        )

        m = HourglassNet(num_stacks=2, depth=3, channels=(64, 64, 96, 96),
                         feat_channel=64, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), _img(64))
        outs = jax.jit(m.apply)(params, _img(64))
        assert len(outs) == 2
        assert outs[0].shape == (1, 16, 16, 64)  # stride 4


class TestNecks:
    def _feats(self):
        rng = np.random.RandomState(0)
        return [jnp.asarray(rng.randn(1, s, s, c), jnp.float32)
                for s, c in [(16, 256), (8, 512), (4, 1024)]]

    def test_pafpn(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.extra_necks import (
            PAFPN,
        )

        m = PAFPN(out_channels=64, num_outs=5, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), self._feats())
        outs = jax.jit(m.apply)(params, self._feats())
        assert len(outs) == 5
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]

    def test_hrfpn(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.extra_necks import (
            HRFPN,
        )

        m = HRFPN(out_channels=64, num_outs=5, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), self._feats())
        outs = jax.jit(m.apply)(params, self._feats())
        assert len(outs) == 5
        assert outs[0].shape == (1, 16, 16, 64)

    def test_bfp_preserves_shapes(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.extra_necks import (
            BFP,
        )

        feats = [jnp.asarray(np.random.RandomState(0).randn(1, s, s, 64),
                             jnp.float32) for s in (16, 8, 4)]
        m = BFP(out_channels=64, refine_level=1, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        outs = jax.jit(m.apply)(params, feats)
        assert [o.shape for o in outs] == [f.shape for f in feats]

    def test_nasfpn(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.extra_necks import (
            NASFPN,
        )

        m = NASFPN(out_channels=64, stack_times=2, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), self._feats())
        outs = jax.jit(m.apply)(params, self._feats())
        assert len(outs) == 5
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]

    def test_fpg(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.extra_necks import (
            FPG,
        )

        m = FPG(out_channels=64, stack_times=2, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), self._feats())
        outs = jax.jit(m.apply)(params, self._feats())
        assert len(outs) == 5

    def test_carafe_fpn(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.necks.extra_necks import (
            FPNCarafe,
        )

        m = FPNCarafe(out_channels=64, num_outs=5, dtype=jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), self._feats())
        outs = jax.jit(m.apply)(params, self._feats())
        assert len(outs) == 5
        assert outs[0].shape == (1, 16, 16, 64)


class TestCarafeOp:
    def test_uniform_kernel_is_average(self):
        """With a uniform 25-tap kernel, CARAFE equals a 5x5 box filter of
        the source pixel's neighborhood."""
        from lowlightenvironmentvideoobjectdetection_tpu.ops.carafe import (
            carafe,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 4, 3), jnp.float32)
        kernels = jnp.full((8, 8, 25), 1.0 / 25)
        out = carafe(x, kernels)
        assert out.shape == (8, 8, 3)
        # output pixel (0,0) = mean of x's (0,0) zero-padded 5x5 patch
        patch = np.zeros((5, 5, 3), np.float32)
        patch[2:, 2:] = np.asarray(x[:3, :3])
        np.testing.assert_allclose(np.asarray(out[0, 0]),
                                   patch.mean(axis=(0, 1)) * 25 / 25,
                                   rtol=1e-5, atol=1e-5)
