"""Space-to-depth stem conv (backbones/resnet.py StemConv): the packed
4-tap/stride-1 form must be EXACTLY the plain 7x7/stride-2 conv — same
parameter tensor, same outputs — for any even input size and channel count
(3-ch sRGB, 4-ch RAW)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
    ResNet,
    StemConv,
)


@pytest.mark.parametrize("c", [3, 4])
def test_s2d_matches_plain(c):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 48, c), jnp.float32)
    plain = StemConv(16, dtype=jnp.float32, space_to_depth=False)
    packed = StemConv(16, dtype=jnp.float32, space_to_depth=True)
    params = plain.init(jax.random.PRNGKey(1), x)
    y0 = plain.apply(params, x)
    y1 = packed.apply(params, x)  # identical tree: just {'kernel': [7,7,c,16]}
    assert y0.shape == y1.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


def test_s2d_falls_back_on_odd_sizes():
    x = jnp.zeros((1, 31, 48, 3))
    packed = StemConv(8, dtype=jnp.float32, space_to_depth=True)
    params = packed.init(jax.random.PRNGKey(0), x)
    assert packed.apply(params, x).shape == (1, 16, 24, 8)


@pytest.mark.parametrize("c", [3, 4])
def test_fused_packed_stem_matches_plain(c):
    """StemConv(packed_out=True) + stem_packed_maxpool == plain conv + pool
    (same [7,7,c,F] parameter; the packed channel order is (s, t, k))."""
    import flax.linen as nn

    from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
        stem_packed_maxpool,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, c), jnp.float32)
    plain = StemConv(16, dtype=jnp.float32)
    packed = StemConv(16, dtype=jnp.float32, packed_out=True)
    params = plain.init(jax.random.PRNGKey(1), x)
    y0 = plain.apply(params, x)
    y2 = packed.apply(params, x)
    assert y2.shape == (2, 8, 12, 64)
    y2u = (y2.reshape(2, 8, 12, 2, 2, 16)
           .transpose(0, 1, 3, 2, 4, 5).reshape(2, 16, 24, 16))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2u),
                               rtol=1e-5, atol=1e-5)
    z0 = nn.max_pool(nn.relu(y0), (3, 3), strides=(2, 2),
                     padding=[(1, 1)] * 2)
    z1 = stem_packed_maxpool(nn.relu(y2), 16)
    assert z1.shape == z0.shape == (2, 8, 12, 16)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.model
def test_resnet_fused_stem_tree_unchanged_and_equal():
    """ResNet(stem_fused=True): identical parameter tree, same features."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32)
    r0 = ResNet(depth=50, out_indices=(3,), dtype=jnp.float32)
    r1 = ResNet(depth=50, out_indices=(3,), dtype=jnp.float32,
                stem_fused=True)
    p = r0.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        r1.init(jax.random.PRNGKey(1), x))
    y0 = r0.apply(p, x)[0]
    y1 = r1.apply(p, x)[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)


def test_resnet_tree_unchanged_and_equal():
    """ResNet(stem_s2d=True) has the identical parameter tree and produces
    the same features as the plain stem (bf16 tolerance)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32)
    r0 = ResNet(depth=50, out_indices=(3,), dtype=jnp.float32)
    r1 = ResNet(depth=50, out_indices=(3,), dtype=jnp.float32, stem_s2d=True)
    p = r0.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        r1.init(jax.random.PRNGKey(1), x))
    y0 = r0.apply(p, x)[0]
    y1 = r1.apply(p, x)[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)

@pytest.mark.parametrize("lvl", [1, 2])
@pytest.mark.parametrize("c", [3, 4])
def test_packed_input_contract_matches_plain(c, lvl):
    """ResNet(input_packed=lvl) over pack_frame^lvl(x) == plain ResNet over
    x, with the identical parameter tree (the MLPerf-style conv0 s2d input
    contract; reference consumes [H, W, C] device-side,
    mmdetection/mmdet/models/backbones/resnet.py:630). Level 2 runs conv1
    as a dense 3x3 16c->256 conv + packed maxpool."""
    from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
        ResNet, pack_frame)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, c), jnp.float32)
    r0 = ResNet(depth=50, in_channels=c, out_indices=(3,), dtype=jnp.float32)
    r1 = ResNet(depth=50, in_channels=c, out_indices=(3,), dtype=jnp.float32,
                input_packed=lvl)
    p = r0.init(jax.random.PRNGKey(1), x)
    xp = x
    for _ in range(lvl):
        xp = pack_frame(xp)
    assert xp.shape == (1, 64 >> lvl, 64 >> lvl, 4 ** lvl * c)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        r1.init(jax.random.PRNGKey(1), xp))
    y0 = r0.apply(p, x)[0]
    y1 = r1.apply(p, xp)[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
    # numpy pack (the host-pipeline path) == jnp pack
    if lvl == 1:
        np.testing.assert_allclose(pack_frame(np.asarray(x)), np.asarray(xp))


@pytest.mark.model
def test_vidmodel_packed_streaming_matches_plain():
    """VIDModel(input_packed=True) streaming == the default contract: same
    boxes/scores on a 3-frame synthetic video (the pack moves to the host
    pipeline; device math is bit-identical)."""
    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        VIDModel)

    rng = np.random.RandomState(0)
    frames = (rng.rand(3, 64, 64, 3) * 255).astype(np.float32)
    kw = dict(pad_h=64, pad_w=64, test_nms_pre=128, test_nms_post=16,
              num_ref_frames=2, compute_dtype=jnp.float32,
              head_dtype=jnp.float32)
    m0 = VIDModel("SELSA", rng_seed=0, **kw)
    m1 = VIDModel("SELSA", rng_seed=0, input_packed=True, **kw)
    m2 = VIDModel("SELSA", rng_seed=0, input_packed=2, **kw)
    for t in range(3):
        r0 = m0.inference_vid(frames[t], t)["bbox_results"]
        r1 = m1.inference_vid(frames[t], t)["bbox_results"]
        r2 = m2.inference_vid(frames[t], t)["bbox_results"]
        for a, b, c in zip(r0, r1, r2):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(a, c, rtol=1e-4, atol=2e-4)
