#!/usr/bin/env python
"""DarkFarm 600x400 variant (reference:
tools/convert_datasets/darkfarm2coco_600x400.py): the e2e resized frame
tree — ``Lists/darkfarm_vid_e2e_{train,val}.txt``, ``.png`` frames, image
size fixed to 600x400 and box corners rescaled with int truncation and
clamped to the new frame (ref :97-125)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from darkfarm2coco_vid import base_json, convert_darkfarm  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-i', '--input', required=True)
    p.add_argument('-o', '--output', required=True)
    a = p.parse_args()
    os.makedirs(a.output, exist_ok=True)
    for txt in ('darkfarm_vid_e2e_train.txt', 'darkfarm_vid_e2e_val.txt'):
        mode = 'train' if 'train' in txt else 'val'
        convert_darkfarm(
            base_json(), a.input, a.output, mode, txt[:-4],
            train_list='Lists/darkfarm_vid_e2e_train.txt',
            file_ext='png', out_size=(600, 400))


if __name__ == '__main__':
    main()
