#!/usr/bin/env python
"""Offline noise injection (reference: demo/add_noise_for_frame.py)."""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("input"); p.add_argument("output")
p.add_argument("--noise-type", default="a7s3")
p.add_argument("--am", type=float, default=0.8)
args = p.parse_args()

import cv2, jax
from lowlightenvironmentvideoobjectdetection_tpu.ops import noise as N

img = cv2.imread(args.input).astype(np.float32)
fn = {"gauss": N.gaussian_noise, "mix": N.poisson_gaussian_noise,
      "a7s3": N.real_camera_noise_a7s3, "a7s3_jpg": N.real_camera_noise_a7s3_jpg}[args.noise_type]
noisy = np.asarray(fn(jax.random.PRNGKey(0), img[None], am=args.am)[0])
cv2.imwrite(args.output, noisy.clip(0, 255).astype(np.uint8))
print(f"wrote {args.output}")
