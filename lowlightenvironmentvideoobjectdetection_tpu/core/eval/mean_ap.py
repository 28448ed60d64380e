"""Detection mAP evaluation (host-side numpy).

Parity targets:
- VOC-style eval: mmdetection/mmdet/core/evaluation/mean_ap.py:267 (``eval_map``
  with 'area' AP, greedy score-ordered matching, per-class accumulation).
- COCO-style AP@[.5:.95]: the reference calls mmpycocotools
  (mmdet/datasets/coco.py:368); here a self-contained 101-point COCO AP.

Detections per image are [N, 5] (x1, y1, x2, y2, score) per class, exactly
the reference's result format.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _tpfp(dets: np.ndarray, gts: np.ndarray, iou_thr: float):
    """Greedy match score-sorted dets against gts. Returns (tp, fp) 0/1
    arrays aligned with score-desc order and the sorted scores."""
    order = np.argsort(-dets[:, 4])
    dets = dets[order]
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    matched = np.zeros(len(gts), bool)
    ious = _iou_matrix(dets[:, :4], gts)
    for i in range(len(dets)):
        if len(gts) and ious[i].max() >= iou_thr:
            j = int(np.argmax(ious[i] * ~matched))
            if ious[i, j] >= iou_thr and not matched[j]:
                matched[j] = True
                tp[i] = 1
                continue
        fp[i] = 1
    return tp, fp, dets[:, 4]


def _ap_area(recall: np.ndarray, precision: np.ndarray) -> float:
    """'area' mode AP (mmdet average_precision, mean_ap.py:12)."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _ap_11points(recall: np.ndarray, precision: np.ndarray) -> float:
    """VOC2007 11-point interpolated AP (mmdet mean_ap.py:12 '11points')."""
    ap = 0.0
    for thr in np.arange(0.0, 1.0 + 1e-3, 0.1):
        precs = precision[recall >= thr]
        ap += (precs.max() if precs.size else 0.0) / 11.0
    return float(ap)


def eval_map(
    det_results: Sequence[Sequence[np.ndarray]],
    annotations: Sequence[Dict],
    iou_thr: float = 0.5,
    mode: str = "area",
) -> Tuple[float, List[Dict]]:
    """VOC-style mAP.

    det_results: per image, per class [N, 5] arrays.
    annotations: per image dicts with 'bboxes' [G, 4] and 'labels' [G].
    mode: 'area' (VOC2012+/COCO-style envelope area) or '11points'
    (VOC2007). Returns (mAP, per-class list of dicts).
    """
    num_classes = len(det_results[0])
    eval_results = []
    for c in range(num_classes):
        cls_dets, cls_gts = [], []
        for dets, ann in zip(det_results, annotations):
            cls_dets.append(np.asarray(dets[c]).reshape(-1, 5))
            mask = np.asarray(ann["labels"]) == c
            cls_gts.append(np.asarray(ann["bboxes"]).reshape(-1, 4)[mask])
        num_gts = sum(len(g) for g in cls_gts)

        tps, fps, scores = [], [], []
        for d, g in zip(cls_dets, cls_gts):
            if len(d) == 0:
                continue
            tp, fp, s = _tpfp(d, g, iou_thr)
            tps.append(tp)
            fps.append(fp)
            scores.append(s)
        if not scores or num_gts == 0:
            eval_results.append(
                dict(ap=0.0, num_gts=num_gts, num_dets=sum(len(d) for d in cls_dets))
            )
            continue
        scores = np.concatenate(scores)
        order = np.argsort(-scores)
        tp = np.cumsum(np.concatenate(tps)[order])
        fp = np.cumsum(np.concatenate(fps)[order])
        recall = tp / num_gts
        precision = tp / np.maximum(tp + fp, 1e-9)
        ap = (_ap_11points(recall, precision) if mode == "11points"
              else _ap_area(recall, precision))
        eval_results.append(
            dict(ap=ap, num_gts=num_gts, num_dets=len(scores),
                 recall=float(recall[-1]) if len(recall) else 0.0)
        )
    valid = [r["ap"] for r in eval_results if r["num_gts"] > 0]
    mean_ap = float(np.mean(valid)) if valid else 0.0
    return mean_ap, eval_results


def eval_coco_ap(
    det_results: Sequence[Sequence[np.ndarray]],
    annotations: Sequence[Dict],
    iou_thrs: Sequence[float] = tuple(np.arange(0.5, 1.0, 0.05)),
) -> Dict[str, float]:
    """COCO-style AP averaged over IoU thresholds (101-point interpolation)."""
    num_classes = len(det_results[0])
    rec_points = np.linspace(0, 1, 101)
    ap_per_thr = {t: [] for t in iou_thrs}
    for c in range(num_classes):
        cls_data = []
        num_gts = 0
        for dets, ann in zip(det_results, annotations):
            d = np.asarray(dets[c]).reshape(-1, 5)
            mask = np.asarray(ann["labels"]) == c
            g = np.asarray(ann["bboxes"]).reshape(-1, 4)[mask]
            num_gts += len(g)
            cls_data.append((d, g))
        if num_gts == 0:
            continue
        for t in iou_thrs:
            tps, fps, scores = [], [], []
            for d, g in cls_data:
                if len(d) == 0:
                    continue
                tp, fp, s = _tpfp(d, g, t)
                tps.append(tp); fps.append(fp); scores.append(s)
            if not scores:
                ap_per_thr[t].append(0.0)
                continue
            scores = np.concatenate(scores)
            order = np.argsort(-scores)
            tp = np.cumsum(np.concatenate(tps)[order])
            fp = np.cumsum(np.concatenate(fps)[order])
            recall = tp / num_gts
            precision = tp / np.maximum(tp + fp, 1e-9)
            # 101-point: precision envelope sampled at fixed recalls
            for i in range(len(precision) - 2, -1, -1):
                precision[i] = max(precision[i], precision[i + 1])
            inds = np.searchsorted(recall, rec_points, side="left")
            q = np.zeros(len(rec_points))
            ok = inds < len(precision)
            q[ok] = precision[inds[ok]]
            ap_per_thr[t].append(float(np.mean(q)))
    out = {}
    if ap_per_thr[iou_thrs[0]]:
        out["AP50"] = float(np.mean(ap_per_thr[iou_thrs[0]]))
        out["mAP"] = float(np.mean([np.mean(v) for v in ap_per_thr.values()]))
    else:
        out["AP50"] = 0.0
        out["mAP"] = 0.0
    return out
