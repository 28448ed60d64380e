#!/usr/bin/env python
"""VID demo (reference: demo/demo_vid.py) — run streaming video object
detection over a directory of frames (or synthetic frames with --synthetic)."""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--config", default="configs/vid/selsa/selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py")
p.add_argument("--input", default=None, help="directory of frames")
p.add_argument("--checkpoint", default=None)
p.add_argument("--synthetic", type=int, default=0)
p.add_argument("--tiny", action="store_true")
p.add_argument("--out", default=None)
args = p.parse_args()

from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import init_model
from lowlightenvironmentvideoobjectdetection_tpu.config import Config

import jax.numpy as jnp
cfg = Config.fromfile(args.config)
mcfg = dict(cfg["model"]); mtype = mcfg.pop("type")
if mtype not in ("SELSA", "FGFA", "DFF"):
    mcfg.setdefault("out_indices", (3,)); mcfg.pop("loss_type", None)
    mcfg.pop("in_channels", None); mtype = "SELSA"
if args.tiny:
    mcfg.update(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                compute_dtype=jnp.float32)
model = init_model(model_type=mtype, checkpoint=args.checkpoint, **mcfg)

if args.synthetic:
    frames = [np.random.RandomState(i).randint(0, 255, (model.cfg.pad_h, model.cfg.pad_w, 3)).astype(np.float32)
              for i in range(args.synthetic)]
else:
    import cv2
    files = sorted(os.listdir(args.input))
    frames = [cv2.imread(os.path.join(args.input, f)).astype(np.float32) for f in files]

for fid, frame in enumerate(frames):
    r = model.inference_vid(frame, fid)
    n = sum(len(b) for b in r["bbox_results"])
    print(f"frame {fid}: {n} detections")
