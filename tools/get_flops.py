#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""FLOPs / parameter / memory-traffic report for a config's model.

The TPU-native analog of mmdetection tools/analysis_tools/get_flops.py:
instead of module-level hook counting, the model's forward is lowered and
XLA's own cost model reports exact compiled FLOPs and bytes accessed —
what the hardware will actually execute, after fusion.

Usage: python tools/get_flops.py CONFIG [--shape H W]
"""
import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
from lowlightenvironmentvideoobjectdetection_tpu.config import Config
from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=None,
                   help="input H W (default: the model's pad bucket)")
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    mcfg = dict(cfg["model"])
    mtype = mcfg.pop("type")
    built = MODELS.get(mtype)(**mcfg)
    model = built[0] if isinstance(built, tuple) else built

    c = getattr(model, "cfg", None)
    in_ch = 3
    if type(model).__name__ in ("SelsaDarkfarmDetector", "FastDVDSelsaDetector"):
        in_ch = 2 * getattr(c, "in_channels", 3)
    if args.shape:
        h, w = args.shape
    else:
        sc = getattr(c, "selsa", c)
        h = getattr(sc, "pad_h", 608)
        w = getattr(sc, "pad_w", 1024)

    x = jnp.zeros((1, h, w, in_ch), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(variables))

    fwd = jax.jit(lambda v, z: model.apply(v, z))
    comp = fwd.lower(variables, x).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print(json.dumps(dict(
        config=args.config,
        model=mtype,
        input=f"{h}x{w}x{in_ch}",
        params_M=round(n_params / 1e6, 3),
        flops_G=round(flops / 1e9, 3),
        bytes_accessed_GB=round(byts / 1e9, 4),
    )))


if __name__ == "__main__":
    main()
