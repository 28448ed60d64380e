#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Capture a jax.profiler (xprof/TensorBoard) device trace of the streaming
SELSA step.

The TPU-idiomatic analog of the reference's `tools/benchmark.py` timing-only
story (mmtracking/tools/benchmark.py:30-60): instead of wall-clock numbers,
this dumps a full XLA op-level timeline viewable in TensorBoard's profile
plugin or Perfetto (`python -m tensorboard.main --logdir OUT`), which is how
hot-op attribution is actually done on TPU hardware.

Usage: python tools/profile_trace.py [--out /tmp/llvod_trace] [--frames 30]
       [--depth 50]
"""
import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
    pack_frame)
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig, SelsaDetector, VideoState,
    cast_params_for_inference, empty_video_state, inference_step,
    init_params, make_anchors)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/llvod_trace")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    cfg = SelsaConfig(depth=args.depth, input_packed=2)
    model = SelsaDetector(cfg=cfg)
    params = cast_params_for_inference(
        init_params(model, jax.random.PRNGKey(0), small=True))
    anchors = make_anchors(cfg)
    state = empty_video_state(cfg, rng=jax.random.PRNGKey(1))
    frame = pack_frame(pack_frame(
        jax.random.normal(jax.random.PRNGKey(2), (cfg.pad_h, cfg.pad_w, 3))))
    img_shape = jnp.asarray([600.0, 1000.0])
    sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    import functools

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, anchors, state, frame, img_shape, sf):
        st, dets = inference_step(model, params, state, frame, img_shape, sf,
                                  anchors)
        # serial dependency so frames can't overlap in the trace
        return st, dets, frame + 1e-12 * dets.scores.sum()

    # compile + warm outside the trace window (donated carry: hand the
    # step fresh clones so `state` survives)
    clone = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    st, dets, fr = step(params, anchors, clone(state), frame, img_shape, sf)
    jax.block_until_ready(dets.scores)

    with jax.profiler.trace(args.out):
        st, fr = clone(state), frame
        for _ in range(args.frames):
            st, dets, fr = step(params, anchors, st, fr, img_shape, sf)
        jax.block_until_ready(dets.scores)
        time.sleep(0.2)  # let the collector drain
    print(f"trace written to {args.out} "
          f"(view: python -m tensorboard.main --logdir {args.out})")


if __name__ == "__main__":
    main()
