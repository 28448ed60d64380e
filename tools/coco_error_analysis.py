#!/usr/bin/env python
"""Per-class / per-error-type detection analysis.

Parity target: mmdetection/tools/coco_error_analysis.py — for each class,
break the precision curve down by error type by progressively relaxing the
matching rule:

- ``ap``        AP at the strict IoU threshold (default 0.5 here; the
                reference uses 0.75/0.5/0.1 bands from COCOeval),
- ``ap_loose``  AP at IoU 0.1 — the gap to ``ap`` is LOCALIZATION error,
- ``ap_no_cls`` AP at IoU 0.1 matching gts of ANY class — the further gap
                is CLASS CONFUSION,
- ``ap_no_bg``  1.0 envelope after also removing unmatched detections —
                the remaining gap to 1.0 splits into BACKGROUND false
                positives and MISSED gts (FN).

Also reports per-area-bucket AP (small/medium/large, COCO conventions) and
per-class gt/detection counts.

Input: the ``--out`` json of tools/test.py (results with ``bbox_results``)
plus the dataset annotations, OR a self-test with synthetic data
(``--selftest``). Prints one JSON report; optionally dumps per-class rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


AREA_BUCKETS = {"small": (0, 32 ** 2), "medium": (32 ** 2, 96 ** 2),
                "large": (96 ** 2, 1e10)}


def _area_mask(boxes: np.ndarray, bucket: str) -> np.ndarray:
    lo, hi = AREA_BUCKETS[bucket]
    if len(boxes) == 0:
        return np.zeros((0,), bool)
    a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return (a >= lo) & (a < hi)


def analyze(det_results, annotations, iou_thr: float = 0.5,
            num_classes: int | None = None):
    """det_results: per image per class [N,5]; annotations: per image dict
    with bboxes/labels. Returns dict(per_class=..., summary=...)."""
    from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
        eval_map,
    )

    num_classes = num_classes or len(det_results[0])

    mAP, per_cls = eval_map(det_results, annotations, iou_thr=iou_thr)
    mAP_loose, per_cls_loose = eval_map(det_results, annotations, iou_thr=0.1)

    # class-agnostic pass: all gts + all dets into one class
    merged_dets = [[np.concatenate([np.asarray(d[c]).reshape(-1, 5)
                                    for c in range(num_classes)])]
                   for d in det_results]
    merged_anns = [dict(bboxes=a["bboxes"],
                        labels=np.zeros(len(a["labels"]), np.int64))
                   for a in annotations]
    mAP_nocls, _ = eval_map(merged_dets, merged_anns, iou_thr=0.1)

    rows = []
    for c in range(num_classes):
        ap = per_cls[c]["ap"]
        ap_loose = per_cls_loose[c]["ap"]
        rows.append(dict(
            cls=c,
            num_gts=int(per_cls[c]["num_gts"]),
            num_dets=int(per_cls[c]["num_dets"]),
            ap=round(float(ap), 4),
            ap_loc_relaxed=round(float(ap_loose), 4),
            err_localization=round(float(max(ap_loose - ap, 0.0)), 4),
        ))

    # per-area AP: filter gts (and drop dets matching removed gts is the
    # COCO protocol; the envelope approximation filters gts only and marks
    # out-of-bucket gts ignore by removing them)
    area_ap = {}
    for bucket in AREA_BUCKETS:
        anns_b = []
        for a in annotations:
            m = _area_mask(np.asarray(a["bboxes"]).reshape(-1, 4), bucket)
            anns_b.append(dict(bboxes=np.asarray(a["bboxes"]).reshape(-1, 4)[m],
                               labels=np.asarray(a["labels"])[m]))
        if sum(len(a["bboxes"]) for a in anns_b) == 0:
            area_ap[bucket] = None
            continue
        ap_b, _ = eval_map(det_results, anns_b, iou_thr=iou_thr)
        area_ap[bucket] = round(float(ap_b), 4)

    summary = dict(
        mAP=round(float(mAP), 4),
        mAP_loc_relaxed=round(float(mAP_loose), 4),
        mAP_class_agnostic=round(float(mAP_nocls), 4),
        err_localization=round(float(max(mAP_loose - mAP, 0.0)), 4),
        err_confusion=round(float(max(mAP_nocls - mAP_loose, 0.0)), 4),
        err_background_and_missed=round(float(max(1.0 - mAP_nocls, 0.0)), 4),
        area_ap=area_ap,
    )
    return dict(summary=summary, per_class=rows)


def _selftest():
    rng = np.random.RandomState(0)
    num_classes = 3
    dets, anns = [], []
    for _ in range(8):
        gts = rng.uniform(10, 200, (3, 2))
        boxes = np.concatenate([gts, gts + rng.uniform(30, 80, (3, 2))], 1)
        labels = rng.randint(0, num_classes, 3)
        anns.append(dict(bboxes=boxes.astype(np.float32), labels=labels))
        per_cls = []
        for c in range(num_classes):
            m = labels == c
            good = boxes[m] + rng.uniform(-2, 2, (m.sum(), 4))  # near-hits
            sc = rng.uniform(0.6, 0.95, (m.sum(), 1))
            noise = rng.uniform(0, 250, (2, 4))
            noise[:, 2:] = noise[:, :2] + 40
            nsc = rng.uniform(0.05, 0.3, (2, 1))
            per_cls.append(np.concatenate(
                [np.concatenate([good, sc], 1),
                 np.concatenate([noise, nsc], 1)]).astype(np.float32))
        dets.append(per_cls)
    return analyze(dets, anns, num_classes=num_classes)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--result", help="tools/test.py --out json")
    p.add_argument("--ann", help="dataset annotation json (COCO format)")
    p.add_argument("--iou-thr", type=float, default=0.5)
    p.add_argument("--selftest", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.selftest:
        report = _selftest()
    else:
        from lowlightenvironmentvideoobjectdetection_tpu.data.coco_det import (
            CocoDataset,
        )

        res = json.load(open(args.result))
        ds = CocoDataset(ann_file=args.ann, img_prefix="", test_mode=True)
        anns = [ds[i]["ann"] for i in range(len(ds))]
        dets = [[np.asarray(c, np.float32).reshape(-1, 5)
                 for c in r["bbox_results"]] for r in res["results"]]
        report = analyze(dets, anns, iou_thr=args.iou_thr)

    print(json.dumps(report["summary"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
