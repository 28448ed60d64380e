"""Round-2 loss-family coverage: IoU losses, balanced L1, GHM-C/R,
gaussian focal, associative embedding (mmdet/models/losses/*)."""

import jax
import jax.numpy as jnp
import numpy as np

from lowlightenvironmentvideoobjectdetection_tpu.core import losses as L


def _boxes():
    pred = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    tgt = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    return pred, tgt


class TestIoUFamily:
    def test_perfect_overlap_zero(self):
        pred, _ = _boxes()
        for fn in (L.iou_loss, L.giou_loss, L.diou_loss, L.ciou_loss):
            v = float(fn(pred, pred))
            assert abs(v) < 1e-4, fn.__name__

    def test_orders_by_overlap(self):
        pred, tgt = _boxes()
        for fn in (L.iou_loss, L.giou_loss, L.diou_loss, L.ciou_loss,
                   L.bounded_iou_loss):
            v_match = float(fn(pred[:1], tgt[:1]))
            v_off = float(fn(pred[1:], tgt[1:]))
            assert v_off > v_match, fn.__name__

    def test_giou_disjoint_negative_giou(self):
        pred = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
        tgt = jnp.asarray([[10.0, 10.0, 12.0, 12.0]])
        # disjoint: GIoU < 0 so loss > 1
        assert float(L.giou_loss(pred, tgt)) > 1.0

    def test_grads_flow(self):
        pred, tgt = _boxes()
        for fn in (L.giou_loss, L.diou_loss, L.ciou_loss,
                   L.bounded_iou_loss):
            g = jax.grad(lambda p: fn(p, tgt))(pred + 0.5)
            assert float(jnp.sum(jnp.abs(g))) > 0, fn.__name__


class TestBalancedL1:
    def test_zero_at_match_and_monotone(self):
        z = jnp.zeros((4,))
        assert abs(float(L.balanced_l1_loss(z, z))) < 1e-6
        small = float(L.balanced_l1_loss(z + 0.1, z))
        big = float(L.balanced_l1_loss(z + 2.0, z))
        assert 0 < small < big


class TestGHM:
    def test_ghm_c_downweights_outliers(self):
        # mostly-easy samples + one hard outlier: GHM weight of the outlier
        # bin is large relative to its population but normalized overall
        logits = jnp.asarray([5.0, 5.0, 5.0, 5.0, -5.0])
        labels = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0])
        v = float(L.ghm_c_loss(logits, labels))
        assert np.isfinite(v) and v > 0

    def test_ghm_r_finite_and_positive(self):
        pred = jnp.asarray([0.0, 0.5, 2.0])
        tgt = jnp.zeros((3,))
        v = float(L.ghm_r_loss(pred, tgt))
        assert np.isfinite(v) and v > 0
        g = jax.grad(lambda p: L.ghm_r_loss(p, tgt))(pred)
        assert np.all(np.isfinite(np.asarray(g)))


class TestCornerLosses:
    def test_gaussian_focal_peak(self):
        tgt = jnp.zeros((4, 4)).at[1, 1].set(1.0)
        good = jnp.full((4, 4), 0.01).at[1, 1].set(0.99)
        bad = jnp.full((4, 4), 0.5)
        assert float(L.gaussian_focal_loss(good, tgt)) < \
            float(L.gaussian_focal_loss(bad, tgt))

    def test_ae_pull_push(self):
        # same-object corners close + objects separated -> low loss
        tl = jnp.asarray([0.0, 5.0])
        br = jnp.asarray([0.0, 5.0])
        valid = jnp.asarray([True, True])
        low = float(L.ae_loss(tl, br, valid))
        # corners of one object far apart -> pull loss grows
        high = float(L.ae_loss(jnp.asarray([0.0, 5.0]),
                               jnp.asarray([4.0, 1.0]), valid))
        assert low < high
