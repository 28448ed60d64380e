"""Mesh-sharded multi-stream serving (parallel/serve.py) on the virtual
8-device CPU mesh: sharded outputs match the single-device program, streams
land on distinct devices, and the serving path inserts no collectives
(streams are independent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig, SelsaDetector, inference_clip_batch, init_params,
    make_anchors)
from lowlightenvironmentvideoobjectdetection_tpu.parallel.serve import (
    batched_video_state, make_serve_step)
from lowlightenvironmentvideoobjectdetection_tpu.parallel.train import (
    create_mesh)

S, T = 8, 2
KW = dict(pad_h=64, pad_w=64, test_nms_pre=128, test_nms_post=16,
          num_ref_frames=2, compute_dtype=jnp.float32,
          head_dtype=jnp.float32)


@pytest.fixture(scope="module")
def serve_setup():
    cfg = SelsaConfig(**KW)
    model = SelsaDetector(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), small=True)
    anchors = make_anchors(cfg)
    states = batched_video_state(cfg, S, rng=jax.random.PRNGKey(1))
    frames = jax.random.normal(
        jax.random.PRNGKey(2), (S, T, cfg.pad_h, cfg.pad_w, 3), jnp.float32)
    shapes = jnp.broadcast_to(jnp.asarray([64.0, 64.0]), (S, 2))
    sfs = jnp.broadcast_to(jnp.ones((4,)), (S, 4))
    return cfg, model, params, anchors, states, frames, shapes, sfs


@pytest.mark.model
def test_sharded_serve_matches_single_device(serve_setup):
    cfg, model, params, anchors, states, frames, shapes, sfs = serve_setup
    assert len(jax.devices()) == 8, "conftest must force the 8-device mesh"

    # single-device golden
    st_ref, dets_ref = jax.jit(
        lambda p, a, st, fr: inference_clip_batch(model, p, st, fr, shapes,
                                                  sfs, a)
    )(params, anchors, states, frames)

    mesh = create_mesh()
    step, shard_args = make_serve_step(model, mesh)
    args = shard_args(params, anchors, states, frames, shapes, sfs)
    st_out, dets = step(*args)

    np.testing.assert_allclose(np.asarray(dets.boxes),
                               np.asarray(dets_ref.boxes), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dets.scores),
                               np.asarray(dets_ref.scores), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dets.valid),
                                  np.asarray(dets_ref.valid))

    # the stream axis is actually sharded: 8 streams -> 8 single-stream
    # shards on 8 distinct devices
    shards = dets.boxes.addressable_shards
    assert len(shards) == 8
    assert len({s.device for s in shards}) == 8
    assert shards[0].data.shape[0] == 1
    # the donated carried memo stays sharded the same way
    kv0 = st_out.ref_kv[0][0]
    assert len(kv0.addressable_shards) == 8


@pytest.mark.model
def test_serving_path_has_no_tensor_collectives(serve_setup):
    """Streams are independent — the compiled serving program must move NO
    tensor data between chips. The only collectives allowed are scalar
    ``pred[]`` all-reduces: the NMS fixpoint's while-condition consensus
    (under SPMD every device must agree when the global loop terminates —
    a one-bit ICI message per iteration)."""
    import re

    cfg, model, params, anchors, states, frames, shapes, sfs = serve_setup
    mesh = create_mesh()
    step, shard_args = make_serve_step(model, mesh)
    args = shard_args(params, anchors, states, frames, shapes, sfs)
    txt = step.lower(*args).compile().as_text()
    for op in ("all-gather", "collective-permute", "reduce-scatter",
               "all-to-all"):
        assert op not in txt, f"serving path unexpectedly contains {op}"
    for line in re.findall(r"\S*all-reduce[^\n]*", txt):
        assert re.search(r"=\s*pred\[\]", line), (
            f"non-scalar all-reduce on the serving path: {line[:160]}")
