"""GHM-C / GHM-R goldens vs independent numpy transcriptions.

Reference: mmdetection/mmdet/models/losses/ghm_loss.py — GHMC (L50-96: bin
the BCE gradient norm |sigmoid(p) - t| into 10 unit regions, weight each
sample by tot/num_in_bin, normalize by the number of non-empty bins, BCE
sum / tot) and GHMR (L127-172: authentic-SmoothL1 sqrt(d^2+mu^2)-mu with
gradient norm |d|/sqrt(d^2+mu^2) binned the same way).

The numpy side below is transcribed straight from the torch loop (python
floats, per-bin masks) — an independent implementation path from the
vectorized jnp.where construction under test.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.core.losses import (
    ghm_c_loss,
    ghm_r_loss,
)


def _np_ghmc(pred, target, label_weight, bins=10):
    edges = np.arange(bins + 1, dtype=np.float32) / bins
    edges[-1] += 1e-6
    weights = np.zeros_like(pred)
    g = np.abs(1.0 / (1.0 + np.exp(-pred)) - target)
    valid = label_weight > 0
    tot = max(float(valid.sum()), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        if num_in_bin > 0:
            weights[inds] = tot / num_in_bin
            n += 1
    if n > 0:
        weights = weights / n
    # BCE-with-logits, elementwise weights, sum reduction
    bce = np.maximum(pred, 0) - pred * target + np.log1p(np.exp(-np.abs(pred)))
    return float((bce * weights).sum() / tot)


def _np_ghmr(pred, target, label_weight, mu=0.02, bins=10):
    edges = np.arange(bins + 1, dtype=np.float32) / bins
    edges[-1] = 1e3
    diff = pred - target
    loss = np.sqrt(diff * diff + mu * mu) - mu
    g = np.abs(diff / np.sqrt(mu * mu + diff * diff))
    weights = np.zeros_like(g)
    valid = label_weight > 0
    tot = max(float(label_weight.sum()), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        if num_in_bin > 0:
            n += 1
            weights[inds] = tot / num_in_bin
    if n > 0:
        weights /= n
    return float((loss * weights).sum() / tot)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ghmc_matches_numpy_transcription(seed):
    rng = np.random.RandomState(seed)
    n, c = 40, 7
    # logits spread wide so every gradient-norm bin gets traffic
    pred = (rng.randn(n, c) * 4.0).astype(np.float32)
    target = (rng.rand(n, c) < 0.3).astype(np.float32)
    label_weight = (rng.rand(n, c) < 0.85).astype(np.float32)

    want = _np_ghmc(pred, target, label_weight)
    got = float(ghm_c_loss(jnp.asarray(pred), jnp.asarray(target),
                           valid=jnp.asarray(label_weight > 0)))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ghmr_matches_numpy_transcription(seed):
    rng = np.random.RandomState(seed + 10)
    n = 60
    pred = (rng.randn(n, 4) * 2.0).astype(np.float32)
    target = (rng.randn(n, 4) * 2.0).astype(np.float32)
    label_weight = (rng.rand(n, 4) < 0.7).astype(np.float32)

    want = _np_ghmr(pred, target, label_weight)
    got = float(ghm_r_loss(jnp.asarray(pred), jnp.asarray(target),
                           valid=jnp.asarray(label_weight > 0)))
    assert got == pytest.approx(want, rel=1e-5)


def test_ghmc_all_invalid_is_zero():
    pred = jnp.ones((5, 3)) * 2.0
    target = jnp.zeros((5, 3))
    got = float(ghm_c_loss(pred, target, valid=jnp.zeros((5, 3), bool)))
    assert got == 0.0
