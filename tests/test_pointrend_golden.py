"""PointRend uncertain-point selection golden vs a numpy transcription.

Reference: mmdetection/mmdet/models/roi_heads/mask_heads/mask_point_head.py
_get_uncertainty (L187-205: uncertainty = -|logit| of the roi's class
channel) + get_roi_rel_points_test (L258+: top-k most-uncertain grid cells,
coords at cell centers). The numpy side argsorts the per-class uncertainty
map directly — independent of the take_along_axis + lax.top_k formulation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
    uncertain_point_indices,
)


@pytest.mark.parametrize("seed", [0, 1])
def test_selection_matches_numpy_class_channel_topk(seed):
    rng = np.random.RandomState(seed)
    n, mh, mw, c, p = 5, 7, 7, 6, 10
    mask_pred = rng.randn(n, mh, mw, c).astype(np.float32)
    labels = rng.randint(0, c, size=n)

    idx, unc = uncertain_point_indices(
        jnp.asarray(mask_pred), jnp.asarray(labels), p)
    idx = np.asarray(idx)

    for i in range(n):
        u = -np.abs(mask_pred[i, :, :, labels[i]].reshape(-1))
        want = set(np.argsort(-u)[:p].tolist())
        assert set(idx[i].tolist()) == want
        # the uncertainty map itself matches
        np.testing.assert_allclose(np.asarray(unc)[i], u, rtol=1e-6)


def test_uncertainty_prefers_near_zero_logits():
    """A logit of 0 (sigmoid 0.5, maximally ambiguous) must be selected
    before confident logits of either sign."""
    mask_pred = np.full((1, 4, 4, 2), 5.0, np.float32)
    mask_pred[0, 2, 3, 1] = 0.01
    mask_pred[0, 1, 1, 1] = -8.0  # confident background, NOT uncertain
    idx, _ = uncertain_point_indices(
        jnp.asarray(mask_pred), jnp.asarray([1]), 1)
    assert int(idx[0, 0]) == 2 * 4 + 3
