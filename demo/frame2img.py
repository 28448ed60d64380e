#!/usr/bin/env python
"""Video <-> frame-directory conversion (reference: demo/frame2img.py)."""
import argparse, os, sys

p = argparse.ArgumentParser()
p.add_argument("mode", choices=["video2frames", "frames2video"])
p.add_argument("input")
p.add_argument("output")
p.add_argument("--fps", type=float, default=30.0)
args = p.parse_args()

import cv2

if args.mode == "video2frames":
    os.makedirs(args.output, exist_ok=True)
    cap = cv2.VideoCapture(args.input)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(os.path.join(args.output, f"{i:06d}.jpg"), frame)
        i += 1
    print(f"wrote {i} frames to {args.output}")
else:
    frames = sorted(f for f in os.listdir(args.input)
                    if f.lower().endswith((".jpg", ".png")))
    first = cv2.imread(os.path.join(args.input, frames[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                         args.fps, (w, h))
    for f in frames:
        vw.write(cv2.imread(os.path.join(args.input, f)))
    vw.release()
    print(f"wrote {len(frames)} frames to {args.output}")
