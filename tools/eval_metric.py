#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Re-evaluate saved detection results against a dataset without re-running
inference — the analog of mmdetection tools/analysis_tools/eval_metric.py.

Input: a .pkl/.npz of per-image, per-class [N, 5] arrays as produced by
tools/test.py --out.
"""
import argparse
import json
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help=".pkl of per-image per-class det arrays")
    p.add_argument("--iou-thr", type=float, default=0.5)
    args = p.parse_args()

    from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
    from lowlightenvironmentvideoobjectdetection_tpu.config import Config
    from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
        eval_map,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.registry import DATASETS

    cfg = Config.fromfile(args.config)
    vcfg = cfg["data"].get("val") or cfg["data"]["test"]
    kwargs = dict(ann_file=vcfg["ann_file"],
                  img_prefix=vcfg.get("img_prefix", ""), test_mode=True)
    if vcfg.get("ref_img_sampler") is not None and \
            vcfg["type"] not in ("CocoDataset", "VOCDataset"):
        kwargs["ref_img_sampler"] = dict(vcfg["ref_img_sampler"])
    ds = DATASETS.get(vcfg["type"])(**kwargs)

    with open(args.results, "rb") as f:
        det_lists = pickle.load(f)
    annotations = [ds.get_ann_info(info) for info in ds.data_infos]
    mean_ap, per_class = eval_map(det_lists, annotations,
                                  iou_thr=args.iou_thr)
    print(json.dumps(dict(
        mAP=round(float(mean_ap), 4),
        iou_thr=args.iou_thr,
        num_images=len(annotations),
        per_class=[round(float(c["ap"]), 4) for c in per_class],
    )))


if __name__ == "__main__":
    main()
