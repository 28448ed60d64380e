"""Whole-clip scan inference (inference_clip) and multi-stream batched scan
(inference_clip_batch) agree with the per-frame streaming loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig,
    SelsaDetector,
    inference_clip,
    inference_clip_batch,
    inference_step,
    init_params,
    init_video_state,
    make_anchors,
)

TINY = SelsaConfig(
    pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=16,
    test_nms_pre=64, test_nms_post=8, num_roi_samples=16,
    num_ref_frames=2, num_classes=3, compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def system():
    model = SelsaDetector(cfg=TINY)
    params = init_params(model, jax.random.PRNGKey(0), small=True)
    anchors = make_anchors(TINY)
    return model, params, anchors


def _frames(seed, t=3):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-2, 2, (t, 64, 64, 3)).astype(np.float32))


def test_clip_scan_matches_step_loop(system):
    model, params, anchors = system
    frames = _frames(0)
    shape = jnp.asarray([60.0, 60.0])
    sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    state0 = init_video_state(model, params, frames[:2], shape, anchors)

    st = state0
    loop_scores = []
    for t in range(frames.shape[0]):
        st, dets = inference_step(model, params, st, frames[t], shape, sf,
                                  anchors, update_memo=True,
                                  do_update=(t % 2 == 0))
        loop_scores.append(np.asarray(dets.scores))

    fst, sdets = jax.jit(
        lambda p, s, f: inference_clip(model, p, s, f, shape, sf, anchors,
                                       update_memo=True, frame_stride=2)
    )(params, state0, frames)
    scan_scores = np.asarray(sdets.scores)
    assert scan_scores.shape[0] == frames.shape[0]
    for t in range(frames.shape[0]):
        np.testing.assert_allclose(scan_scores[t], loop_scores[t],
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fst.ref_valid),
                               np.asarray(st.ref_valid))


def test_clip_batch_streams_independent(system):
    model, params, anchors = system
    f0, f1 = _frames(1), _frames(2)
    shape = jnp.asarray([60.0, 60.0])
    sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    s0 = init_video_state(model, params, f0[:2], shape, anchors)
    s1 = init_video_state(model, params, f1[:2], shape, anchors)

    states = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), s0, s1)
    frames = jnp.stack([f0, f1])
    shapes = jnp.broadcast_to(shape, (2, 2))
    sfs = jnp.broadcast_to(sf, (2, 4))

    _, bdets = jax.jit(
        lambda p, s, f: inference_clip_batch(model, p, s, f, shapes, sfs,
                                             anchors)
    )(params, states, frames)

    # stream 0 of the batch == running stream 0 alone
    _, alone = inference_clip(model, params, s0, f0, shape, sf, anchors)
    np.testing.assert_allclose(np.asarray(bdets.scores)[0],
                               np.asarray(alone.scores), rtol=1e-4, atol=1e-4)
    # streams differ (no cross-stream leakage)
    assert not np.allclose(np.asarray(bdets.scores)[0],
                           np.asarray(bdets.scores)[1])
