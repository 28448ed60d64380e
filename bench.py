"""Benchmark: SELSA R50-DC5 streaming video inference, frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference's published SELSA R50-DC5 inference speed of
7.5 fps (GPU, bs=1) — mmtracking/configs/vid/selsa/README.md:24, recorded in
BASELINE.md. vs_baseline = our fps / 7.5.
"""

import argparse
import json
import time

import jax

# persistent compile cache: the large inference graph compiles once per
# machine; later bench runs (and the driver's) start in seconds.
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
    inference_step,
    init_params,
    make_anchors,
)

BASELINE_FPS = 7.5


def main(mode: str = "clip"):
    # packed-input streaming contract (input_packed=2): frames arrive
    # space-to-depth packed twice, [H/4, W/4, 48] — the host pipeline packs
    # alongside normalize/pad (pack_frame x2); conv1 runs as a dense 3x3
    # 48->256 conv + packed maxpool. Level 1 measured +7% end-to-end, level
    # 2 a further ~370 us/frame off the stem.
    cfg = SelsaConfig(input_packed=2)
    model = SelsaDetector(cfg=cfg)
    params = cast_params_for_inference(
        init_params(model, jax.random.PRNGKey(0), small=True))
    anchors = make_anchors(cfg)

    # canonical memo layout + dtype (head-major bf16 K/V, as the real
    # init_video_state produces)
    state = empty_video_state(cfg, rng=jax.random.PRNGKey(1))
    img_shape = jnp.asarray([600.0, 1000.0])
    scale_factor = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    # ALL arrays must be jit ARGUMENTS: closing over them embeds them as HLO
    # constants, which on tunneled TPU backends costs milliseconds PER CALL
    # (re-upload) — even for a [2]-element img_shape. (Weights additionally
    # overflow the remote-compile request as constants: HTTP 413.)
    @jax.jit
    def step(params, anchors, state, frame, img_shape, scale_factor):
        return inference_step(
            model, params, state, frame, img_shape, scale_factor, anchors
        )

    frame = pack_frame(pack_frame(
        jax.random.normal(jax.random.PRNGKey(2), (cfg.pad_h, cfg.pad_w, 3))))

    # Honest timing over a remote-TPU tunnel: block_until_ready alone can
    # under-report (dispatch pipelining), so each step's output feeds the
    # next step's input (serial chain) and we take a differential between a
    # 10-step and a 110-step run to cancel the single end-of-chain readback.
    def step_dep(params, anchors, state, frame, img_shape, scale_factor):
        st, dets = inference_step(
            model, params, state, frame, img_shape, scale_factor, anchors
        )
        nxt = frame + 1e-12 * dets.scores.sum()
        return st, dets, nxt

    # donate the carried VideoState: without aliasing, XLA copies the ~35 MB
    # pass-through K/V memo into fresh output buffers EVERY frame (~115
    # us/frame of pure copies in the xprof trace)
    step_dep = jax.jit(step_dep, donate_argnums=(2,))
    # fresh (non-donated) state buffers per chain so `state` itself survives
    clone = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    st, dets, fr = step_dep(params, anchors, clone(state), frame, img_shape,
                            scale_factor)
    float(jax.device_get(dets.scores.sum()))  # warm + compile

    def run(n):
        st, fr = clone(state), frame
        t0 = time.perf_counter()
        for _ in range(n):
            st, dets, fr = step_dep(params, anchors, st, fr, img_shape,
                                    scale_factor)
        jax.device_get(dets.scores.sum())
        return time.perf_counter() - t0

    if mode == "clip":
        # whole-clip mode: the memo scan runs as ONE compiled program
        # (models/vid/selsa.py inference_clip — the "zero host round-trips"
        # north-star form). Robust against tunnel dispatch latency: the
        # per-frame streaming loop pays one RPC per frame, which on a
        # degraded tunnel day swamped the 2.5 ms/frame device compute
        # (392.7 -> 137.7 "fps" with an identical graph); a clip is one
        # dispatch regardless of length.
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            inference_clip,
        )

        def clip_fps(n_short, n_long):
            def run_clip(frames):
                st, dets = inference_clip(
                    model, params, clone(state), frames, img_shape,
                    scale_factor, anchors)
                return dets.scores.sum()

            run_clip = jax.jit(run_clip)
            mk = lambda n: jnp.broadcast_to(frame, (n,) + frame.shape)
            f_s, f_l = mk(n_short), mk(n_long)
            float(jax.device_get(run_clip(f_s)))  # compile short
            float(jax.device_get(run_clip(f_l)))  # compile long
            diffs = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jax.device_get(run_clip(f_s)))
                t_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(jax.device_get(run_clip(f_l)))
                t_l = time.perf_counter() - t0
                diffs.append(t_l - t_s)
            diffs.sort()
            return (n_long - n_short) / max(diffs[1], 1e-9)

        fps = clip_fps(20, 120)
    else:
        # per-frame streaming dispatch (the interactive inference_vid path)
        diffs = []
        for _ in range(3):
            t_short, t_long = run(20), run(220)
            diffs.append(t_long - t_short)
        diffs.sort()
        fps = 200.0 / max(diffs[1], 1e-9)

    print(
        json.dumps(
            {
                "metric": "selsa_r50_dc5_stream_fps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="clip", choices=["clip", "stream"])
    main(ap.parse_args().mode)
