"""KV-cached streaming head (forward_cached_stream_kv + fused attention)
agrees with the activation-cached streaming head and the joint forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.bbox_head import (
    Shared2FCBBoxHead,
)
from lowlightenvironmentvideoobjectdetection_tpu.ops.fused_attention import (
    selsa_attention_reference,
    selsa_fused_attention,
)


def _inputs(n=8, m=24):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, 7, 7, 512).astype(np.float32) * 0.05)
    ref = jnp.asarray(rng.randn(m, 7, 7, 512).astype(np.float32) * 0.05)
    ref_mask = jnp.asarray(rng.rand(m) > 0.2)
    self_mask = jnp.ones((n,), bool)
    return x, ref, ref_mask, self_mask


def test_kv_stream_matches_activation_stream():
    h = Shared2FCBBoxHead(num_classes=5, with_selsa=True, dtype=jnp.float32)
    x, ref, ref_mask, self_mask = _inputs()
    params = h.init(jax.random.PRNGKey(0), x, ref.reshape(ref.shape[0], -1))

    ref_stages = h.apply(params, ref, method=Shared2FCBBoxHead.ref_transform)
    (cls_a, reg_a), cur_stages = h.apply(
        params, x, ref_stages, ref_mask, self_mask,
        method=Shared2FCBBoxHead.forward_cached_stream)

    ref_kvs = h.apply(params, ref, method=Shared2FCBBoxHead.ref_transform_kv)
    (cls_k, reg_k), cur_kvs = h.apply(
        params, x, ref_kvs, ref_mask, self_mask,
        method=Shared2FCBBoxHead.forward_cached_stream_kv)

    np.testing.assert_allclose(np.asarray(cls_k), np.asarray(cls_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg_k), np.asarray(reg_a),
                               rtol=1e-4, atol=1e-4)
    # the memo entries are head-major projections of the returned activations
    for (ck, cv), act in zip(cur_kvs, cur_stages):
        assert ck.shape == (16, x.shape[0], 64)
        assert cv.shape == (16, x.shape[0], 64)


def test_fused_attention_2slab_interpret_matches_concat():
    """Two-slab kernel (memo slab ++ current-frame slab, joint softmax,
    no concatenated K/V) == single-slab reference over the concatenation."""
    from lowlightenvironmentvideoobjectdetection_tpu.ops.fused_attention import (
        selsa_attention_reference_hm,
        selsa_fused_attention_2slab_hm,
    )

    rng = np.random.RandomState(3)
    n, m1, m2, nb, hd = 12, 40, 12, 4, 32
    q = jnp.asarray(rng.randn(n, nb, hd).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rng.randn(nb, m1, hd).astype(np.float32) * 0.1)
    v1 = jnp.asarray(rng.randn(nb, m1, hd).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(nb, m2, hd).astype(np.float32) * 0.1)
    v2 = jnp.asarray(rng.randn(nb, m2, hd).astype(np.float32) * 0.1)
    b1 = jnp.where(jnp.asarray(rng.rand(m1) > 0.2), 0.0, -1e30)
    b2 = jnp.where(jnp.asarray(rng.rand(m2) > 0.2), 0.0, -1e30)
    ref = selsa_attention_reference_hm(
        q, jnp.concatenate([k1, k2], axis=1),
        jnp.concatenate([v1, v2], axis=1), jnp.concatenate([b1, b2]))
    out = selsa_fused_attention_2slab_hm(q, k1, v1, k2, v2, b1, b2,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_interpret_matches_reference():
    rng = np.random.RandomState(2)
    n, m, nb, hd = 12, 40, 4, 32
    q = jnp.asarray(rng.randn(n, nb, hd).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(m, nb, hd).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(m, nb, hd).astype(np.float32) * 0.1)
    bias = jnp.where(jnp.asarray(rng.rand(m) > 0.2), 0.0, -1e30)
    ref = selsa_attention_reference(q, k, v, bias)
    out = selsa_fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
