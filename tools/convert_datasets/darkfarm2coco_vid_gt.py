#!/usr/bin/env python
"""DarkFarm GT-pair variant converter
(reference: tools/convert_datasets/darkfarm2coco_vid_gt.py:37 — identical to
darkfarm2coco_vid but driven by the ``darkfarm_vid_gt_*`` lists whose videos
carry sibling GT/ clean-frame directories for pair loading)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from darkfarm2coco_vid import convert  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("list_file",
                   help="Lists/darkfarm_vid_gt_{train,val}.txt")
    p.add_argument("out")
    a = p.parse_args()
    convert(a.root, a.list_file, a.out)
