#!/usr/bin/env python
"""FPS benchmark CLI.

Parity target: mmtracking/tools/benchmark.py — N iterations of the compiled
inference step with device sync timing, skipping the first warmup iters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        init_model,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.config import (
        Config, apply_cli_options,
    )

    cfg = Config.fromfile(args.config)
    apply_cli_options(cfg, args.cfg_options)
    import jax
    import jax.numpy as jnp

    mcfg = dict(cfg["model"])
    mtype = mcfg.pop("type")
    if mtype not in ("SELSA", "FGFA", "DFF", "FasterRCNN"):
        mcfg.setdefault("out_indices", (3,))
        mcfg.pop("loss_type", None)
        mcfg.pop("in_channels", None)
        mtype = "SELSA"
    if args.tiny:
        mcfg.update(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                    compute_dtype=jnp.float32)
    model = init_model(model_type=mtype, **mcfg)
    h, w = model.cfg.pad_h, model.cfg.pad_w
    frame = np.random.RandomState(0).randint(0, 255, (h, w, 3)).astype(np.float32)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        r = model.inference_vid(frame, i)
        jax.block_until_ready(r["bbox_results"])
        if i >= args.warmup:
            times.append(time.perf_counter() - t0)
    fps = 1.0 / float(np.mean(times))
    print(json.dumps(dict(model=mtype, fps=round(fps, 2),
                          mean_ms=round(1000 * float(np.mean(times)), 2),
                          p50_ms=round(1000 * float(np.median(times)), 2),
                          iters=len(times), backend=jax.default_backend())))


if __name__ == "__main__":
    main()
