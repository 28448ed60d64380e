#!/usr/bin/env python
"""Gigapixel sliding-window detection.

Parity target: mmdetection/tools/panda_toolkits/task1_test.py (300 LoC) —
tile a huge image into overlapping windows, run the detector per window,
offset detections back to global coordinates, and merge with one global
class-wise NMS (``fine_det_full`` / ``nms_after_det``).

TPU-native shape: every window has the SAME padded size, so one compiled
detector step is reused across all tiles (no recompiles); the global merge
is the fixed-shape ``batched_nms``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def tile_grid(h: int, w: int, win: int, overlap: float) -> List[Tuple[int, int]]:
    """Top-left corners covering (h, w) with the given overlap fraction."""
    stride = max(int(win * (1 - overlap)), 1)

    def starts(total):
        s = list(range(0, max(total - win, 0) + 1, stride))
        if not s or s[-1] + win < total:
            s.append(max(total - win, 0))
        return sorted(set(s))

    return [(y, x) for y in starts(h) for x in starts(w)]


def sliding_window_detect(model, image: np.ndarray, win: int = 1024,
                          overlap: float = 0.25, iou_thr: float = 0.5,
                          max_out: int = 500):
    """model: apis.inference DetectorModel. Returns (boxes, scores, labels)."""
    import jax.numpy as jnp

    from lowlightenvironmentvideoobjectdetection_tpu.core import nms as N

    h, w = image.shape[:2]
    all_b, all_s, all_l = [], [], []
    for (y, x) in tile_grid(h, w, win, overlap):
        tile = image[y:y + win, x:x + win]
        per_class = model.inference_detector(tile.astype(np.float32))
        for c, arr in enumerate(per_class):
            if len(arr) == 0:
                continue
            b = arr[:, :4] + np.asarray([x, y, x, y], np.float32)
            all_b.append(b)
            all_s.append(arr[:, 4])
            all_l.append(np.full((len(arr),), c, np.int32))
    if not all_b:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int32))
    boxes = np.concatenate(all_b)
    scores = np.concatenate(all_s)
    labels = np.concatenate(all_l)
    res = N.batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(labels), iou_thr, max_out)
    keep = np.asarray(res.valid)
    return (np.asarray(res.boxes)[keep], np.asarray(res.scores)[keep],
            np.asarray(labels)[np.asarray(res.inds)[keep]])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image", help="path to a (large) image")
    p.add_argument("--model", default="FasterRCNN")
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--win", type=int, default=1024)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--out", default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        init_detector,
    )

    kw = {}
    if args.tiny:
        kw = dict(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                  compute_dtype=jnp.float32)
        args.win = min(args.win, 64)
    model = init_detector(args.model, num_classes=args.num_classes, **kw)
    image = cv2.imread(args.image)
    boxes, scores, labels = sliding_window_detect(
        model, image, win=args.win, overlap=args.overlap)
    print(json.dumps(dict(num_dets=len(boxes),
                          image_shape=list(image.shape[:2]))))
    if args.out:
        json.dump(dict(boxes=boxes.tolist(), scores=scores.tolist(),
                       labels=labels.tolist()), open(args.out, "w"))


if __name__ == "__main__":
    main()
