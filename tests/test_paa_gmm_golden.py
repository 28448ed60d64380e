"""PAA GMM-reassignment golden vs the reference's actual sklearn pipeline.

Transcribes mmdetection/mmdet/models/dense_heads/paa_head.py:
- paa_reassign:320-345 — per-gt sklearn GaussianMixture(2) with
  means_init=(min, max), weights_init=(.5, .5), unit precisions,
  covariance_type='diag' (:77), fit on the loss-sorted candidate column;
- gmm_separation_scheme:370-399 — scheme (c): fg = component 0, positives
  are `pos_inds_gmm[fgs][:argmax(score_samples[fgs]) + 1]`, i.e. the fg
  candidates up to the fg mode in loss order.

The jax `_gmm_pos_split` runs a fixed-iteration batched EM from the same
init; on separated candidate-score clusters (the regime PAA's GMM step is
designed for) the converged keep-set must match sklearn's exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

sklearn_mixture = pytest.importorskip("sklearn.mixture")

from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
    paa_head as P,
)


def np_paa_separation(losses):
    """mmdet paa_reassign + gmm_separation_scheme on one gt's candidate
    losses (1-D, any order). Returns a bool keep mask in the input order."""
    order = np.argsort(losses, kind="stable")
    x = losses[order].reshape(-1, 1).astype(np.float64)
    means_init = np.array([x.min(), x.max()]).reshape(2, 1)
    gmm = sklearn_mixture.GaussianMixture(
        2,
        weights_init=np.array([0.5, 0.5]),
        means_init=means_init,
        precisions_init=np.array([1.0, 1.0]).reshape(2, 1),
        covariance_type="diag",
    )
    gmm.fit(x)
    assign = gmm.predict(x)
    scores = gmm.score_samples(x)
    fgs = assign == 0
    keep_sorted = np.zeros(len(x), bool)
    if fgs.any():
        pos_thr_ind = int(scores[fgs].argmax())
        keep_sorted[np.nonzero(fgs)[0][: pos_thr_ind + 1]] = True
    keep = np.zeros(len(x), bool)
    keep[order] = keep_sorted
    return keep


def bimodal(rng, n_lo, n_hi, lo=0.6, hi=4.0, spread=0.15):
    return np.concatenate([
        rng.normal(lo, spread, n_lo),
        rng.normal(hi, spread * 2, n_hi),
    ]).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_gmm_pos_split_matches_sklearn_scheme_c(seed):
    rng = np.random.RandomState(seed)
    rows = [
        bimodal(rng, 6, 10),
        bimodal(rng, 3, 13, lo=0.3, hi=6.0),
        bimodal(rng, 8, 8, lo=1.0, hi=5.0),
    ]
    G, K = len(rows), len(rows[0])
    scores = jnp.asarray(np.stack(rows))
    valid = jnp.ones((G, K), bool)
    ours = np.asarray(P._gmm_pos_split(scores, valid, iters=50))
    for g in range(G):
        ref = np_paa_separation(rows[g])
        np.testing.assert_array_equal(
            ours[g], ref,
            err_msg=f"seed={seed} gt={g} losses={rows[g]}")


def test_gmm_pos_split_padded_candidates():
    rng = np.random.RandomState(7)
    row = bimodal(rng, 5, 7)
    padded = np.concatenate([row, np.full(4, 9.9, np.float32)])
    valid = np.concatenate([np.ones(12, bool), np.zeros(4, bool)])
    ours = np.asarray(P._gmm_pos_split(jnp.asarray(padded[None]),
                                       jnp.asarray(valid[None]), iters=50))[0]
    ref = np_paa_separation(row)
    np.testing.assert_array_equal(ours[:12], ref)
    assert not ours[12:].any()
