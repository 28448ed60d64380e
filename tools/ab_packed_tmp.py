import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Same-session A/B: plain [H,W,3] input vs packed [H/2,W/2,12] contract."""
import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
    pack_frame)
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig, SelsaDetector, cast_params_for_inference, empty_video_state,
    inference_step, init_params, make_anchors)


def bench(cfg, tag):
    model = SelsaDetector(cfg=cfg)
    params = cast_params_for_inference(
        init_params(model, jax.random.PRNGKey(0), small=True))
    anchors = make_anchors(cfg)
    state = empty_video_state(cfg, rng=jax.random.PRNGKey(1))
    img_shape = jnp.asarray([600.0, 1000.0])
    scale = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    frame = jax.random.normal(jax.random.PRNGKey(2), (cfg.pad_h, cfg.pad_w, 3))
    if cfg.input_packed:
        frame = pack_frame(frame)

    @jax.jit
    def step_dep(params, anchors, state, frame, img_shape, scale):
        st, dets = inference_step(model, params, state, frame, img_shape,
                                  scale, anchors)
        nxt = frame + 1e-12 * dets.scores.sum()
        return st, dets, nxt

    st, dets, fr = step_dep(params, anchors, state, frame, img_shape, scale)
    s = float(jax.device_get(dets.scores.sum()))

    def run(n):
        t0 = time.perf_counter()
        st, fr = state, frame
        for _ in range(n):
            st, dets, fr = step_dep(params, anchors, st, fr, img_shape, scale)
        jax.device_get(dets.scores.sum())
        return time.perf_counter() - t0

    diffs = []
    for _ in range(3):
        t_s, t_l = run(20), run(120)
        diffs.append(t_l - t_s)
    diffs.sort()
    fps = 100.0 / max(diffs[1], 1e-9)
    print(f"{tag}: {fps:.1f} fps  (score checksum {s:.4f})", flush=True)
    return fps, s


a = bench(SelsaConfig(), "plain input (default)")
b = bench(dataclasses.replace(SelsaConfig(), input_packed=True), "packed input")
a2 = bench(SelsaConfig(), "plain input (re-check)")
print(f"delta: {100*(b[0]/max(a[0],a2[0])-1):+.1f}% vs best plain")
