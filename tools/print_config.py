#!/usr/bin/env python
"""Dump the fully-merged config (reference: tools/print_config.py)."""
import argparse, json, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lowlightenvironmentvideoobjectdetection_tpu.config import Config, apply_cli_options

p = argparse.ArgumentParser()
p.add_argument("config")
p.add_argument("--cfg-options", nargs="*", default=None)
args = p.parse_args()
cfg = Config.fromfile(args.config)
apply_cli_options(cfg, args.cfg_options)
print(json.dumps(cfg, indent=2, default=str))
