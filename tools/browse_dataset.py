#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Render pipeline outputs with their gt boxes for visual inspection.

The analog of mmdetection tools/misc/browse_dataset.py: iterate the train
dataset through its configured pipeline and write annotated images to
--output-dir (cv2 drawing, no GUI).
"""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--output-dir", default="./browse_out")
    p.add_argument("--max-images", type=int, default=20)
    args = p.parse_args()

    import cv2

    from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
    from lowlightenvironmentvideoobjectdetection_tpu.config import Config
    from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines import Compose
    from lowlightenvironmentvideoobjectdetection_tpu.registry import DATASETS

    cfg = Config.fromfile(args.config)
    dcfg = cfg["data"]["train"]
    ds_kwargs = dict(ann_file=dcfg["ann_file"],
                     img_prefix=dcfg.get("img_prefix", ""))
    if dcfg.get("ref_img_sampler") is not None and \
            dcfg["type"] not in ("CocoDataset", "VOCDataset"):
        ds_kwargs["ref_img_sampler"] = dict(dcfg["ref_img_sampler"])
    ds = DATASETS.get(dcfg["type"])(**ds_kwargs)
    pipe = Compose(dcfg["pipeline"])
    os.makedirs(args.output_dir, exist_ok=True)

    n = min(len(ds), args.max_images)
    for i in range(n):
        s = ds[i]
        sample = dict(img_info=s["img_info"], ann=s["ann"],
                      img_prefix=ds.img_prefix)
        if "ref_img_infos" in s:
            frames = [sample] + [
                dict(img_info=r, ann=a, img_prefix=ds.img_prefix)
                for r, a in zip(s["ref_img_infos"], s["ref_anns"])]
            out = pipe(frames)
        else:
            out = pipe(sample)
        img = np.asarray(out["img"], np.float32)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6) * 255
        img = img[..., :3].astype(np.uint8).copy()
        for b in np.asarray(out.get("gt_bboxes",
                                    np.zeros((0, 4)))).astype(int):
            cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), (0, 255, 0), 1)
        path = os.path.join(args.output_dir, f"{i:04d}.jpg")
        cv2.imwrite(path, img)
        print("wrote", path)


if __name__ == "__main__":
    main()
