#!/usr/bin/env python
"""ImageNet-VID converter, multi-snippet val-list variant
(reference: tools/convert_datasets/imagenet2coco_vid2.py — identical
conversion to imagenet2coco_vid but driven by the 30-class
``VID_val_videos_30.txt`` lists where one video contributes several
annotated snippets, collected per video name instead of one row each)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from imagenet2coco_vid import convert  # noqa: E402


def read_multi_snippet_list(list_file):
    """Collect snippet start frames per video name (vid2 list format:
    ``name <ignored> start_frame ... num_frames``)."""
    infos = {}
    for line in open(list_file):
        parts = line.split()
        if not parts:
            continue
        infos.setdefault(parts[0], []).append(
            int(parts[2]) if len(parts) > 2 else 0)
    return infos


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("vid_root")
    p.add_argument("ann_root")
    p.add_argument("out")
    p.add_argument("--classes-file", default=None)
    p.add_argument("--list-file", default=None,
                   help="VID_val_videos_30.txt multi-snippet list (only "
                        "videos named there are converted)")
    a = p.parse_args()
    if a.list_file:
        keep = set(read_multi_snippet_list(a.list_file))
        # restrict the annotation tree to the listed snippets via a temp view
        import tempfile

        tmp = tempfile.mkdtemp()
        for name in sorted(os.listdir(a.ann_root)):
            if name in keep or any(name.startswith(k) for k in keep):
                os.symlink(os.path.join(os.path.abspath(a.ann_root), name),
                           os.path.join(tmp, name))
        convert(a.vid_root, tmp, a.out, a.classes_file)
    else:
        convert(a.vid_root, a.ann_root, a.out, a.classes_file)
