"""Space-to-depth stem conv (backbones/resnet.py StemConv): the packed
4-tap/stride-1 form must be EXACTLY the plain 7x7/stride-2 conv — same
parameter tensor, same outputs — for any even input size and channel count
(3-ch sRGB, 4-ch RAW)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
