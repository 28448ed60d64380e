#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Throughput experiment on the real TPU: per-frame step vs whole-clip scan
vs multi-stream batched scan.

Timing follows bench.py's tunnel-honest methodology: serial data dependency
(each call's output perturbs the next call's input) + differential between a
short and a long chain to cancel the end-of-chain readback.
"""
import json
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
    pack_frame,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig,
    SelsaDetector,
    VideoState,
    cast_params_for_inference,
    empty_video_state,
    inference_clip,
    inference_clip_batch,
    inference_step,
    init_params,
    make_anchors,
)


def fresh_state(cfg, rng, n=None):
    # canonical memo layout (head-major bf16); n = leading stream batch
    st = empty_video_state(cfg, rng=rng)
    if n is None:
        return st
    tile = lambda a: jnp.broadcast_to(a[None], (n,) + a.shape)
    return VideoState(
        ref_kv=tuple((tile(k), tile(v)) for k, v in st.ref_kv),
        ref_valid=tile(st.ref_valid),
        next_slot=jnp.zeros((n,), jnp.int32),
    )


def chain_diff(run, short=3, long=13):
    diffs = []
    for _ in range(3):
        t_s, t_l = run(short), run(long)
        diffs.append(t_l - t_s)
    diffs.sort()
    return diffs[1] / (long - short)


def main():
    # packed-input serving contract, as bench.py (s4d: frames ship
    # [H/4, W/4, 48], packed by the host pipeline)
    cfg = SelsaConfig(input_packed=2)
    model = SelsaDetector(cfg=cfg)
    pk = lambda a: pack_frame(pack_frame(a))
    params = cast_params_for_inference(
        init_params(model, jax.random.PRNGKey(0), small=True))
    anchors = make_anchors(cfg)
    img_shape = jnp.asarray([600.0, 1000.0])
    sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    T = int(os.environ.get("CLIP_T", "16"))
    results = {}

    # -- mode A: per-frame step (bench.py's current headline) ------------
    @partial(jax.jit, donate_argnums=(2,))
    def stepA(params, anchors, st, fr, ishape, sfv):
        nst, dets = inference_step(model, params, st, fr, ishape, sfv, anchors)
        return nst, dets, fr + 1e-12 * dets.scores.sum()

    clone = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    st0 = fresh_state(cfg, jax.random.PRNGKey(1))
    fr0 = pk(jax.random.normal(jax.random.PRNGKey(2),
                               (cfg.pad_h, cfg.pad_w, 3)))
    st, dets, fr = stepA(params, anchors, clone(st0), fr0, img_shape, sf)
    float(jax.device_get(dets.scores.sum()))

    def runA(n):
        st, fr = clone(st0), fr0
        t0 = time.perf_counter()
        for _ in range(n):
            st, dets, fr = stepA(params, anchors, st, fr, img_shape, sf)
        jax.device_get(dets.scores.sum())
        return time.perf_counter() - t0

    per_call = chain_diff(runA, short=20, long=120)
    results["step_fps"] = 1.0 / per_call

    # -- mode B: whole-clip scan ----------------------------------------
    @partial(jax.jit, donate_argnums=(2,))
    def stepB(params, anchors, st, frames, ishape, sfv):
        nst, dets = inference_clip(model, params, st, frames, ishape, sfv,
                                   anchors)
        return nst, dets, frames + 1e-12 * dets.scores.sum()

    frames0 = pk(jax.random.normal(jax.random.PRNGKey(3),
                                   (T, cfg.pad_h, cfg.pad_w, 3)))
    st, dets, frames = stepB(params, anchors, clone(st0), frames0, img_shape,
                             sf)
    float(jax.device_get(dets.scores.sum()))

    def runB(n):
        st, fr = clone(st0), frames0
        t0 = time.perf_counter()
        for _ in range(n):
            st, dets, fr = stepB(params, anchors, st, fr, img_shape, sf)
        jax.device_get(dets.scores.sum())
        return time.perf_counter() - t0

    per_call = chain_diff(runB)
    results["clip_fps"] = T / per_call

    # -- mode C: multi-stream batched scan ------------------------------
    # the carried state + frame batch are donated (the frame batch alone is
    # S*T*7.6 MB f32; without donation the chain holds two copies and S=8
    # OOMs the 16 GB chip mid-run)
    for S in (2, 4, 8):
        @partial(jax.jit, donate_argnums=(2, 3))
        def stepC(params, anchors, st, frames, ishape, sfv):
            nst, dets = inference_clip_batch(
                model, params, st, frames, ishape, sfv, anchors)
            return nst, dets, frames + 1e-12 * dets.scores.sum()

        ishS = jnp.broadcast_to(img_shape, (S, 2))
        sfS = jnp.broadcast_to(sf, (S, 4))

        def fresh(S=S):
            return (fresh_state(cfg, jax.random.PRNGKey(4), n=S),
                    pk(jax.random.normal(jax.random.PRNGKey(5),
                                         (S, T, cfg.pad_h, cfg.pad_w, 3))))

        def runC(n, S=S, ishS=ishS, sfS=sfS):
            st, fr = fresh()  # donated buffers are consumed per run
            jax.block_until_ready(fr)
            t0 = time.perf_counter()
            for _ in range(n):
                st, dets, fr = stepC(params, anchors, st, fr, ishS, sfS)
            jax.device_get(dets.scores.sum())
            return time.perf_counter() - t0

        try:
            st, fr = fresh()
            st, dets, fr = stepC(params, anchors, st, fr, ishS, sfS)
            float(jax.device_get(dets.scores.sum()))
            del st, dets, fr
            per_call = chain_diff(runC)
            results[f"stream{S}_fps"] = S * T / per_call
        except Exception as e:  # OOM at large S
            results[f"stream{S}_fps"] = f"failed: {type(e).__name__}"
            continue

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
