#!/usr/bin/env python
"""SOT demo (reference: demo/demo_sot.py) — SiamRPN++ tracking."""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--synthetic", type=int, default=4)
args = p.parse_args()

import jax
import jax.numpy as jnp
from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS
from lowlightenvironmentvideoobjectdetection_tpu.models.sot import siamrpn as S

cfg = S.SiamRPNConfig(exemplar_size=63, search_size=127)
model = S.SiamRPN(cfg=cfg)
z = jnp.zeros((1, cfg.exemplar_size, cfg.exemplar_size, 3))
x = jnp.zeros((1, cfg.search_size, cfg.search_size, 3))
params = jax.jit(model.init)(jax.random.PRNGKey(0), z, x)
cls, _ = model.apply(params, z, x)
score_size = cls.shape[0]
anchors = jnp.asarray(S.sot_grid_anchors(cfg, score_size))
window = jnp.asarray(S.hanning_window(score_size, cfg.num_anchors))

rng = np.random.RandomState(0)
img0 = jnp.asarray(rng.randint(0, 255, (256, 256, 3)).astype(np.float32))
state = S.sot_init(model, params, img0, [100.0, 100.0, 156.0, 156.0])
print(f"frame 0: init bbox={np.asarray(state.bbox).round(1).tolist()}")
for fid in range(1, args.synthetic):
    img = jnp.asarray(rng.randint(0, 255, (256, 256, 3)).astype(np.float32))
    state, score, xyxy = S.sot_track(model, params, state, img, anchors, window)
    print(f"frame {fid}: bbox={np.asarray(xyxy).round(1).tolist()} "
          f"score={float(score):.3f}")
