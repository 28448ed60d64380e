"""Tests for the dark (denoising) backbone family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.dark_resnet import (
    DARK_VARIANTS,
    DarkResNet,
    LayerDenoisingPlugin,
    make_dark_backbone,
)


def _frames(t=3, hw=64, c=3, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(t, hw, hw, c), jnp.float32
    )


class TestDarkVariants:
    @pytest.mark.parametrize("name", ["DarkResNet", "ResNet_B1", "ResNetH"])
    def test_forward_shapes(self, name):
        bb = make_dark_backbone(name, out_indices=(2, 3))
        x = _frames(c=bb.in_channels)
        params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
        f3, f4 = jax.jit(bb.apply)(params, x)
        assert f3.shape == (3, 4, 4, 1024)
        assert f4.shape == (3, 2, 2, 2048)
        assert np.all(np.isfinite(np.asarray(f4)))

    def test_raw_variant_4ch(self):
        bb = make_dark_backbone("DarkRAWResNet", out_indices=(3,))
        x = _frames(c=4)
        params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
        (out,) = jax.jit(bb.apply)(params, x)
        assert out.shape == (3, 2, 2, 2048)

    def test_unknown_name(self):
        with pytest.raises(KeyError):
            make_dark_backbone("ResNetZ")

    def test_all_variants_buildable(self):
        for name in DARK_VARIANTS:
            bb = make_dark_backbone(name)
            assert isinstance(bb, DarkResNet), name


class TestConvLSTM:
    def test_temporal_mixing(self):
        """The ConvLSTM stage must make frame t's features depend on earlier
        frames (unlike a plain per-frame ResNet)."""
        bb = make_dark_backbone("DarkResNet", out_indices=(1,))
        x = _frames(t=3)
        params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
        (out_a,) = bb.apply(params, x)
        # perturb frame 0 only; frame 2's features must change
        x2 = x.at[0].add(1.0)
        (out_b,) = bb.apply(params, x2)
        assert float(jnp.abs(out_b[2] - out_a[2]).max()) > 0

    def test_bidirectional_mixes_future(self):
        """ResNet_A's bidirectional pass makes frame 0 depend on later frames."""
        bb = make_dark_backbone("ResNet_A", out_indices=(3,))
        x = _frames(t=3)
        params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)
        (out_a,) = bb.apply(params, x)
        x2 = x.at[2].add(1.0)  # perturb LAST frame
        (out_b,) = bb.apply(params, x2)
        assert float(jnp.abs(out_b[0] - out_a[0]).max()) > 0


class TestPlugin:
    def test_plugin_shape_preserving(self):
        mod = LayerDenoisingPlugin()
        x = _frames(t=3, hw=8, c=64, seed=1)
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_cbam_plugin(self):
        mod = LayerDenoisingPlugin(with_cbam=True)
        x = _frames(t=2, hw=8, c=64, seed=2)
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == x.shape


class TestSelsaWithDarkBackbone:
    def test_selsa_variant_forward(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaConfig, SelsaDetector,
        )

        cfg = SelsaConfig(
            pad_h=64, pad_w=64, num_classes=5, compute_dtype=jnp.float32,
            backbone_variant="ResNetC",
        )
        model = SelsaDetector(cfg=cfg)
        imgs = _frames(t=2)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        stage_feats, neck = model.apply(
            params, imgs, method=SelsaDetector.extract_feat
        )
        assert neck.shape == (2, 4, 4, cfg.neck_channels)

    def test_backbones_registry(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.registry import BACKBONES

        for name in DARK_VARIANTS:
            assert name in BACKBONES, name
        bb = BACKBONES.get("ResNetD")(out_indices=(3,))
        assert bb.with_cbam
