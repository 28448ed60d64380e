"""TemporalRoIAlign golden vs a plain-torch transcription of the reference.

Reference algorithm: mmtracking/mmtrack/models/roi_heads/roi_extractors/
temporal_roi_align.py:44-181 — most_similar_roi_align (cosine-similarity
top-k softmax gather from the last-level reference maps) followed by
temporal_attentional_feature_aggregation (tiny embed conv, per-block
dot-product weights scaled by sqrt(C/nb), softmax over the [key]+refs axis).

The torch side below is transcribed independently from the reference's
documented tensor math (NCHW, per-image loop) — not imported — and the flax
module runs with the same embed-conv weights, so this is a same-weights
same-output check across layouts (NCHW torch vs NHWC jax) including the
channel-block grouping of the multi-head attention.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.temporal_roi_align import (
    TemporalRoIAlign,
)


def _torch_most_similar(roi_feats, ref_feats, k):
    """roi_feats: [roi_n, C, h, w]; ref_feats: [img_n, C, H, W] ->
    [img_n, roi_n, C, h, w]. Transcription of temporal_roi_align.py:101-181."""
    roi_e = roi_feats / roi_feats.norm(p=2, dim=1, keepdim=True)
    ref_e = ref_feats / ref_feats.norm(p=2, dim=1, keepdim=True)
    roi_n, c, rh, rw = roi_e.shape
    img_n, _, h, w = ref_e.shape
    q = roi_e.permute(0, 2, 3, 1).reshape(-1, c)
    km = ref_e.permute(1, 0, 2, 3).reshape(c, -1)
    sim = (q @ km).view(-1, img_n, h * w)
    vals, idx = sim.topk(k=k, dim=2, largest=True)
    vals = vals.softmax(dim=2)
    ref_r = ref_feats.permute(2, 3, 0, 1).reshape(-1, img_n, c)
    outs = []
    for i in range(img_n):
        topk_feats = ref_r[idx[:, i], i, :]
        outs.append((topk_feats * vals[:, i].unsqueeze(-1)).sum(dim=1)[None])
    out = torch.cat(outs, dim=0).view(img_n, roi_n, rh, rw, c)
    return out.permute(0, 1, 4, 2, 3)


def _torch_aggregate(x, ref_x, conv, nb):
    """x: [1, roi_n, C, h, w]; ref_x: [img_n, roi_n, C, h, w].
    Transcription of temporal_roi_align.py:44-99."""
    x = torch.cat((x, ref_x), dim=0)
    img_n, roi_n, _, rh, rw = x.shape
    x_embed = conv(x.view(img_n * roi_n, -1, rh, rw))
    c = x_embed.size(1)
    x_embed = x_embed.view(img_n, roi_n, nb, -1, rh, rw)
    target = x_embed[[0]]
    ada = torch.sum(x_embed * target, dim=3, keepdim=True) / (
        float(c / nb) ** 0.5
    )
    ada = ada.expand(-1, -1, -1, int(c / nb), -1, -1).contiguous()
    ada = ada.view(img_n, roi_n, c, rh, rw).softmax(dim=0)
    return (x * ada).sum(dim=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_troi_same_weights_same_output(seed):
    rng = np.random.RandomState(seed)
    roi_n, rh, rw, c = 5, 7, 7, 16
    img_n, h, w = 3, 9, 11
    nb, k = 4, 2
    roi = rng.randn(roi_n, rh, rw, c).astype(np.float32)
    ref = rng.randn(img_n, h, w, c).astype(np.float32)

    mod = TemporalRoIAlign(
        out_channels=c, num_most_similar_points=k,
        num_temporal_attention_blocks=nb,
    )
    params = mod.init(jax.random.PRNGKey(seed), jnp.asarray(roi), jnp.asarray(ref))
    # fresh random embed weights (init is near-zero-bias; randomize to make
    # the attention weights non-trivial)
    kern = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    bias = rng.randn(c).astype(np.float32) * 0.1
    params = jax.tree_util.tree_map(lambda x: x, params)
    params = {"params": {"embed_network": {"kernel": jnp.asarray(kern),
                                           "bias": jnp.asarray(bias)}}}
    got = np.asarray(jax.jit(mod.apply)(params, jnp.asarray(roi), jnp.asarray(ref)))

    # torch side, NCHW
    troi = torch.from_numpy(roi).permute(0, 3, 1, 2)
    tref = torch.from_numpy(ref).permute(0, 3, 1, 2)
    conv = torch.nn.Conv2d(c, c, 3, padding=1, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kern).permute(3, 2, 0, 1))
        conv.bias.copy_(torch.from_numpy(bias))
        ref_roi = _torch_most_similar(troi, tref, k)
        want = _torch_aggregate(troi[None], ref_roi, conv, nb)
    want = want.permute(0, 2, 3, 1).numpy()  # [roi_n, h, w, C]

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_troi_mean_path_matches_torch():
    rng = np.random.RandomState(7)
    roi = rng.randn(4, 7, 7, 8).astype(np.float32)
    ref = rng.randn(2, 6, 5, 8).astype(np.float32)
    mod = TemporalRoIAlign(
        out_channels=8, num_most_similar_points=2,
        num_temporal_attention_blocks=0,
    )
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(roi), jnp.asarray(ref))
    got = np.asarray(mod.apply(params, jnp.asarray(roi), jnp.asarray(ref)))

    troi = torch.from_numpy(roi).permute(0, 3, 1, 2)
    tref = torch.from_numpy(ref).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_roi = _torch_most_similar(troi, tref, 2)
        want = torch.cat((troi[None], ref_roi), dim=0).mean(dim=0)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_troi_no_refs_is_identity():
    rng = np.random.RandomState(3)
    roi = rng.randn(4, 7, 7, 8).astype(np.float32)
    mod = TemporalRoIAlign(out_channels=8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(roi), None)
    got = np.asarray(mod.apply(params, jnp.asarray(roi), None))
    np.testing.assert_allclose(got, roi, rtol=0, atol=0)
