#!/usr/bin/env python
"""DarkFarm GT-pair variant (reference:
tools/convert_datasets/darkfarm2coco_vid_gt.py): same output as
darkfarm2coco_vid but driven by ``Lists/darkfarm_vid_gt_{train,val}.txt``
and with the per-frame xml INSIDE each video directory (ref :89-91) — the
GT-pair trees store clean frames and annotations together.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from darkfarm2coco_vid import base_json, convert_darkfarm, xml_path_gt  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-i', '--input', required=True)
    p.add_argument('-o', '--output', required=True)
    a = p.parse_args()
    os.makedirs(a.output, exist_ok=True)
    for txt in ('darkfarm_vid_gt_train.txt', 'darkfarm_vid_gt_val.txt'):
        mode = 'train' if 'train' in txt else 'val'
        convert_darkfarm(
            base_json(), a.input, a.output, mode, txt[:-4],
            xml_path_fn=xml_path_gt,
            train_list='Lists/darkfarm_vid_gt_train.txt')


if __name__ == '__main__':
    main()
