#!/usr/bin/env python
"""MOT demo (reference: demo/demo_mot.py) — DeepSORT over frames."""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--synthetic", type=int, default=5)
p.add_argument("--tiny", action="store_true")
args = p.parse_args()

import jax.numpy as jnp
from lowlightenvironmentvideoobjectdetection_tpu import zoo
from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import inference_mot
from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

kw = dict(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
          compute_dtype=jnp.float32) if args.tiny else {}
model = MODELS.get("DeepSORT")(**kw)
for fid in range(args.synthetic):
    frame = np.random.RandomState(fid).randint(0, 255, (120, 160, 3)).astype(np.float32)
    r = inference_mot(model, frame, fid)
    print(f"frame {fid}: {len(r.get('track_bboxes', []))} tracks")
