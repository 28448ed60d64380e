"""Per-workload on-chip fps bench (VERDICT r3 #6): DFF, FGFA, SiamRPN++,
DeepSORT — the reference's published anchors that BENCH only covers for
SELSA (bench.py).

Anchors (BASELINE.md, V100-class GPU, bs=1):
  DFF R50-DC5 44.0 fps | FGFA R50-DC5 6.9 fps | SiamRPN++ R50 50.0 fps |
  DeepSORT (private dets + R50 ReID) 13.8 fps.

Compiled-state workloads (DFF/FGFA/SiamRPN) time with bench.py's
serial-chain differential (each step's output feeds the next step's input;
long-minus-short run cancels the single end-of-chain readback) — honest
over remote-TPU tunnels where block_until_ready under-reports. DeepSORT's
tracking loop is host-driven by design (Kalman/LAP consume each frame's
detections), so it is timed wall-clock with its inherent per-frame sync;
over a tunnel that includes the ~30 ms RTT per frame, which a local TPU
host does not pay — reported as `host_loop: true`.

Usage: python tools/bench_workloads.py [--workloads dff,fgfa,siamrpn,deepsort]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ANCHORS = {"dff": 44.0, "fgfa": 6.9, "siamrpn": 50.0, "deepsort": 13.8}


def _chain_fps(step_dep, init_args, n_short=20, n_long=120):
    """Serial-chain differential timing; step_dep returns (args..., scalar)."""
    clone = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    def run(n):
        # fresh buffers each run: the carried state is donated inside the step
        args = clone(init_args)
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            *args, out = step_dep(*args)
        float(jax.device_get(out))
        return time.perf_counter() - t0

    run(3)  # warm/compile
    diffs = sorted(run(n_long) - run(n_short) for _ in range(3))
    return (n_long - n_short) / max(diffs[1], 1e-9)


def bench_dff():
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.fgfa import (
        DFFState, dff_inference_step, make_dff,
    )

    model, anchors = make_dff()
    cfg = model.cfg
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
        init_params,
    )

    params = init_params(model, jax.random.PRNGKey(0), small=True)
    frame = jax.random.normal(jax.random.PRNGKey(1),
                              (cfg.pad_h, cfg.pad_w, 3))
    state = DFFState(
        jnp.zeros((cfg.pad_h, cfg.pad_w, 3)),
        jnp.zeros((cfg.pad_h // cfg.stride, cfg.pad_w // cfg.stride,
                   cfg.neck_channels), cfg.compute_dtype),
        jnp.zeros((), jnp.int32))
    shape = jnp.asarray([600.0, 1000.0])
    sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    def step_dep(params, anchors, state, frame, shape, sf):
        st, dets = dff_inference_step(model, params, state, frame, shape,
                                      sf, anchors)
        s = dets.scores.sum()
        return params, anchors, st, frame + 1e-12 * s, shape, sf, s

    step_dep = jax.jit(step_dep, donate_argnums=(2,))
    return _chain_fps(step_dep, (params, anchors, state, frame, shape, sf))


def bench_fgfa():
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.fgfa import (
        fgfa_inference_step, fgfa_init_state, make_fgfa,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
        init_params,
    )

    model, anchors = make_fgfa()
    cfg = model.cfg
    params = init_params(model, jax.random.PRNGKey(0), small=True)
    refs = jax.random.normal(jax.random.PRNGKey(1),
                             (2, cfg.pad_h, cfg.pad_w, 3))
    state = jax.jit(lambda p, r: fgfa_init_state(model, p, r))(params, refs)
    frame = jax.random.normal(jax.random.PRNGKey(2),
                              (cfg.pad_h, cfg.pad_w, 3))
    shape = jnp.asarray([600.0, 1000.0])
    sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    def step_dep(params, anchors, state, frame, shape, sf):
        st, dets = fgfa_inference_step(model, params, state, frame, shape,
                                       sf, anchors)
        s = dets.scores.sum()
        return params, anchors, st, frame + 1e-12 * s, shape, sf, s

    step_dep = jax.jit(step_dep, donate_argnums=(2,))
    return _chain_fps(step_dep, (params, anchors, state, frame, shape, sf),
                      n_short=10, n_long=60)


def bench_siamrpn():
    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        SOTModel,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.models.sot.siamrpn import (
        sot_init, sot_track,
    )

    m = SOTModel()
    img = jax.random.normal(jax.random.PRNGKey(1), (360, 640, 3)) * 50 + 100
    state = jax.jit(lambda p, im: sot_init(m.model, p, im,
                                           jnp.asarray([100., 80., 200., 180.])
                                           ))(m.params, img)

    def step_dep(params, anchors, window, state, img):
        st, score, box = sot_track(m.model, params, state, img, anchors,
                                   window)
        return params, anchors, window, st, img + 1e-12 * score, score

    step_dep = jax.jit(step_dep, donate_argnums=(3,))
    return _chain_fps(step_dep, (m.params, m.anchors, m.window, state, img))


def bench_deepsort():
    from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS
    from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401

    model = MODELS.get("DeepSORT")(num_classes=1)
    h, w = model.detector.cfg.pad_h, model.detector.cfg.pad_w
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.uniform(-2, 2, (h, w, 3)), jnp.float32)
              for _ in range(8)]
    shape = np.asarray([600.0, 1000.0])
    model.track_frame(0, frames[0], shape)  # compile

    def run(n):
        # pipelined streaming path: frame t+1's detect+ReID dispatched
        # before blocking on frame t — hides the tunnel RTT + device
        # compute behind host-side Kalman/LAP association
        t0 = time.perf_counter()
        model.track_video((frames[i % 8] for i in range(n)), shape)
        return time.perf_counter() - t0

    run(5)
    n = 60
    return n / run(n)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workloads", default="dff,fgfa,siamrpn,deepsort")
    args = p.parse_args()
    fns = dict(dff=bench_dff, fgfa=bench_fgfa, siamrpn=bench_siamrpn,
               deepsort=bench_deepsort)
    out = {"backend": jax.default_backend()}
    for wname in args.workloads.split(","):
        fps = fns[wname]()
        out[wname] = {
            "fps": round(fps, 2),
            "anchor_fps": ANCHORS[wname],
            "vs_baseline": round(fps / ANCHORS[wname], 2),
        }
        if wname == "deepsort":
            out[wname]["host_loop"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
