#!/usr/bin/env python
"""DarkFarm converter at the 600x400 training scale
(reference: tools/convert_datasets/darkfarm2coco_600x400.py — same list
parsing as darkfarm2coco_vid with box coordinates rescaled to the 600x400
resized frame tree used by the fusion_add configs)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from darkfarm2coco_vid import convert  # noqa: E402


def convert_rescaled(root, list_file, out_file, width=600, height=400,
                     src_width=1920, src_height=1080):
    tmp = out_file + ".tmp"
    convert(root, list_file, tmp)
    data = json.load(open(tmp))
    os.remove(tmp)
    sx, sy = width / src_width, height / src_height
    for img in data["images"]:
        img["width"], img["height"] = width, height
    for a in data["annotations"]:
        x, y, w, h = a["bbox"]
        a["bbox"] = [x * sx, y * sy, w * sx, h * sy]
        a["area"] = a["bbox"][2] * a["bbox"][3]
    json.dump(data, open(out_file, "w"))
    print(f"wrote {out_file} at {width}x{height}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("list_file")
    p.add_argument("out")
    p.add_argument("--width", type=int, default=600)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--src-width", type=int, default=1920)
    p.add_argument("--src-height", type=int, default=1080)
    a = p.parse_args()
    convert_rescaled(a.root, a.list_file, a.out, a.width, a.height,
                     a.src_width, a.src_height)
