"""Benchmark: SELSA R50-DC5 streaming video inference, frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference's published SELSA R50-DC5 inference speed of
7.5 fps (GPU, bs=1) — mmtracking/configs/vid/selsa/README.md:24, recorded in
BASELINE.md. vs_baseline = our fps / 7.5.
"""

import json
import time

import jax

# persistent compile cache: the large inference graph compiles once per
# machine; later bench runs (and the driver's) start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig,
    SelsaDetector,
    VideoState,
    inference_step,
    init_params,
    make_anchors,
)

BASELINE_FPS = 7.5


def main():
    cfg = SelsaConfig()
    model = SelsaDetector(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), small=True)
    anchors = make_anchors(cfg)

    s, p = cfg.num_ref_frames, cfg.test_nms_post
    rng = jax.random.PRNGKey(1)
    state = VideoState(
        ref_fc=(
            jax.random.normal(rng, (s, p, 1024)) * 0.1,
            jax.random.normal(rng, (s, p, 1024)) * 0.1,
        ),
        ref_valid=jnp.ones((s, p), bool),
        next_slot=jnp.zeros((), jnp.int32),
    )
    img_shape = jnp.asarray([600.0, 1000.0])
    scale_factor = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    # params/anchors must be jit ARGUMENTS: closing over them would embed
    # ~100MB of weights as HLO constants and overflow the remote-compile
    # request (HTTP 413) on tunneled TPU setups.
    @jax.jit
    def step(params, anchors, state, frame):
        return inference_step(
            model, params, state, frame, img_shape, scale_factor, anchors
        )

    frame = jax.random.normal(jax.random.PRNGKey(2), (cfg.pad_h, cfg.pad_w, 3))

    # warmup / compile
    for _ in range(3):
        state, dets = step(params, anchors, state, frame)
    jax.block_until_ready(dets.boxes)

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, dets = step(params, anchors, state, frame)
    jax.block_until_ready(dets.boxes)
    dt = time.perf_counter() - t0
    fps = n / dt

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
    main()
