#!/usr/bin/env python
"""Low-light VID demo (reference: demo/demo_vid_dark.py) — demo_vid with
optional on-the-fly noise injection and low-light Brighten preprocessing
before the streaming darkfarm/SELSA model."""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--config",
               default="configs/vid/llvod/llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py")
p.add_argument("--input", default=None, help="directory of frames")
p.add_argument("--checkpoint", default=None)
p.add_argument("--synthetic", type=int, default=0)
p.add_argument("--tiny", action="store_true")
p.add_argument("--add-noise", default=None,
               help="noise model (gauss/mix/a7s3/a7s3_jpg) applied per frame")
p.add_argument("--brighten", type=float, default=0.25,
               help="Brighten target mean m (0 disables)")
args = p.parse_args()

from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import init_model
from lowlightenvironmentvideoobjectdetection_tpu.config import Config

import jax
import jax.numpy as jnp

cfg = Config.fromfile(args.config)
mcfg = dict(cfg["model"]); mtype = mcfg.pop("type")
# darkfarm-family checkpoints stream through the SELSA detector subtree
mcfg.setdefault("out_indices", (3,)); mcfg.pop("loss_type", None)
mcfg.pop("in_channels", None)
stream_type = "SELSA"
if args.tiny:
    mcfg.update(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                compute_dtype=jnp.float32)
model = init_model(model_type=stream_type, checkpoint=args.checkpoint, **mcfg)

if args.synthetic:
    frames = [np.random.RandomState(i).randint(0, 60,
              (model.cfg.pad_h, model.cfg.pad_w, 3)).astype(np.float32)
              for i in range(args.synthetic)]
else:
    import cv2
    files = sorted(os.listdir(args.input))
    frames = [cv2.imread(os.path.join(args.input, f)).astype(np.float32)
              for f in files]

if args.add_noise:
    from lowlightenvironmentvideoobjectdetection_tpu.ops.noise import add_noise_clean_pairs

    key = jax.random.PRNGKey(0)
    # ImageNet RGB stats used by the normalized pair output
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    noisy = []
    for i, f in enumerate(frames):
        noise, _ = add_noise_clean_pairs(
            jax.random.fold_in(key, i), jnp.asarray(f)[None],
            noise_type=args.add_noise)
        noisy.append(np.clip(np.asarray(noise[0]) * std + mean, 0, 255))
    frames = noisy

if args.brighten > 0:
    # SeqBrighten semantics: amplify so the mean approaches m (shared amp)
    amp = args.brighten * 255.0 / max(np.mean([f.mean() for f in frames]), 1.0)
    frames = [np.clip(f * amp, 0, 255) for f in frames]

for fid, frame in enumerate(frames):
    r = model.inference_vid(frame, fid)
    n = sum(len(b) for b in r["bbox_results"])
    print(f"frame {fid}: {n} detections")
