#!/usr/bin/env python
"""Split a composite checkpoint into per-submodule checkpoints
(reference: tools/extract_checkpoints.py — feeds the
``pretrains=dict(detector=..., cleaner=...)`` warm-start mechanism)."""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lowlightenvironmentvideoobjectdetection_tpu.utils.checkpoint import (
    extract_submodule, load_checkpoint, save_checkpoint)

p = argparse.ArgumentParser()
p.add_argument("checkpoint")
p.add_argument("--submodules", nargs="+", default=["selsa", "cleaner"])
p.add_argument("--out-dir", default=".")
args = p.parse_args()

state = load_checkpoint(args.checkpoint)
# a TrainState restores as {'params': variables, 'opt_state': ..., 'step': ...};
# a bare variables tree restores as {'params': {...}, 'batch_stats': {...}}
if hasattr(state, "params"):
    variables = state.params
elif isinstance(state, dict) and "opt_state" in state:
    variables = state["params"]
else:
    variables = state
for sub in args.submodules:
    piece = extract_submodule(variables, sub)
    if not piece:
        print(f"submodule {sub!r} not found; skipping")
        continue
    out = save_checkpoint(os.path.join(args.out_dir, sub), piece)
    print(f"{sub} -> {out}")
