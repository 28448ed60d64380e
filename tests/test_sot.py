"""SiamRPN++ SOT tests: correlation op, init/track cycle, pair loss, OPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.core.eval.sot import eval_sot_ope
from lowlightenvironmentvideoobjectdetection_tpu.models.sot.siamrpn import (
    SiamRPN,
    SiamRPNConfig,
    depthwise_correlation,
    hanning_window,
    siamrpn_loss,
    sot_grid_anchors,
    sot_init,
    sot_track,
)

TINY = SiamRPNConfig(exemplar_size=63, search_size=127)


class TestCorrelation:
    def test_depthwise_correlation_golden(self):
        # kernel of ones over a linear ramp = local window sums per channel
        search = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
        kernel = jnp.ones((2, 2, 1))
        out = depthwise_correlation(search, kernel)
        assert out.shape == (3, 3, 1)
        np.testing.assert_allclose(out[0, 0, 0], 0 + 1 + 4 + 5)
        np.testing.assert_allclose(out[2, 2, 0], 10 + 11 + 14 + 15)

    def test_channels_independent(self):
        search = jnp.stack(
            [jnp.ones((4, 4)), jnp.zeros((4, 4))], axis=-1
        )
        kernel = jnp.ones((2, 2, 2))
        out = depthwise_correlation(search, kernel)
        np.testing.assert_allclose(out[..., 0], 4.0)
        np.testing.assert_allclose(out[..., 1], 0.0)


@pytest.fixture(scope="module")
def siam_system():
    model = SiamRPN(cfg=TINY)
    z = jnp.zeros((1, TINY.exemplar_size, TINY.exemplar_size, 3))
    x = jnp.zeros((1, TINY.search_size, TINY.search_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z, x)
    cls, _ = model.apply(params, z, x)
    score_size = cls.shape[0]
    anchors = jnp.asarray(sot_grid_anchors(TINY, score_size))
    window = jnp.asarray(hanning_window(score_size, TINY.num_anchors))
    return model, params, anchors, window


class TestSiamRPN:
    def test_forward_shapes(self, siam_system):
        model, params, anchors, window = siam_system
        z = jnp.zeros((1, TINY.exemplar_size, TINY.exemplar_size, 3))
        x = jnp.zeros((1, TINY.search_size, TINY.search_size, 3))
        cls, reg = model.apply(params, z, x)
        assert cls.shape[-1] == 2 * TINY.num_anchors
        assert reg.shape[-1] == 4 * TINY.num_anchors
        assert cls.shape[:2] == reg.shape[:2]

    def test_init_track_cycle(self, siam_system):
        model, params, anchors, window = siam_system
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.uniform(0, 1, (240, 320, 3)).astype(np.float32))
        state = sot_init(model, params, img, [100.0, 80.0, 160.0, 140.0])
        assert state.bbox.shape == (4,)
        state2, score, xyxy = sot_track(model, params, state, img, anchors, window)
        assert xyxy.shape == (4,)
        assert np.isfinite(float(score))
        # box stays in image
        assert 0 <= float(xyxy[0]) <= 320 and 0 <= float(xyxy[3]) <= 240
        # template unchanged during tracking
        for a, b in zip(state.z_feats, state2.z_feats):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pair_loss(self, siam_system):
        model, params, anchors, window = siam_system
        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.uniform(0, 1, (1, TINY.exemplar_size, TINY.exemplar_size, 3)).astype(np.float32))
        x = jnp.asarray(rng.uniform(0, 1, (1, TINY.search_size, TINY.search_size, 3)).astype(np.float32))
        total, metrics = siamrpn_loss(
            model, params, z, x, jnp.asarray([0.0, 0.0, 40.0, 60.0]),
            anchors, is_positive_pair=jnp.asarray(True),
            rng=jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(total)) and float(total) > 0
        grads = jax.grad(
            lambda p: siamrpn_loss(model, p, z, x,
                                   jnp.asarray([0.0, 0.0, 40.0, 60.0]),
                                   anchors, jnp.asarray(True),
                                   rng=jax.random.PRNGKey(2))[0]
        )(params)
        gsum = jax.tree_util.tree_reduce(
            lambda a, v: a + float(jnp.sum(jnp.abs(v))), grads["params"], 0.0
        )
        assert gsum > 0


class TestOPE:
    def test_perfect(self):
        boxes = [np.array([10, 10, 50, 50], np.float64)] * 5
        res = eval_sot_ope([boxes], [boxes])
        assert res["precision"] == 100.0
        assert res["norm_precision"] == 100.0
        assert res["success"] > 95.0

    def test_complete_miss(self):
        gt = [np.array([10, 10, 50, 50], np.float64)] * 3
        pred = [np.array([200, 200, 240, 240], np.float64)] * 3
        res = eval_sot_ope([pred], [gt])
        assert res["precision"] == 0.0
        assert res["success"] < 10.0
