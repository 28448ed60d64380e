"""Native LVIS-protocol detection evaluation.

Parity target: mmdetection/mmdet/datasets/lvis.py:309 ``evaluate`` — which
delegates to the external ``lvis`` pip package's ``LVISEval``. That package
is not vendorable here, so the protocol is implemented natively (numpy, on
top of the same greedy tp/fp matcher as mean_ap.py):

- **Federated evaluation** (the LVIS paper's core rule): category ``c`` is
  scored only on images where it is *exhaustively annotated* (has gt and is
  not listed in the image's ``not_exhaustive_category_ids``) or *verified
  absent* (listed in ``neg_category_ids``). Detections of ``c`` on any other
  image are ignored — neither TP nor FP.
- AP averaged over IoU 0.50:0.95 (10 thresholds), 101-point interpolation,
  like COCO.
- **Frequency bands**: APr/APc/APf over rare (1-10 training images), common
  (11-100) and frequent (>100) categories, read from the category table's
  ``frequency`` field (LVIS v1) or derived from ``image_count`` (v0.5).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .mean_ap import _tpfp_coco as _tpfp

_REC_POINTS = np.linspace(0, 1, 101)


def frequency_bands(categories: Sequence[dict]) -> Dict[int, str]:
    """category id -> 'r' | 'c' | 'f' from the LVIS category table."""
    bands = {}
    for c in categories:
        f = c.get("frequency")
        if f is None:
            n = c.get("image_count", 0)
            f = "r" if n <= 10 else ("c" if n <= 100 else "f")
        bands[c["id"]] = f
    return bands


def _class_ap(cls_data, num_gts: int, iou_thr: float) -> Optional[float]:
    """COCO 101-point AP for one class at one IoU from (dets, gts) pairs."""
    tps, fps, scores = [], [], []
    for d, g in cls_data:
        if len(d) == 0:
            continue
        tp, fp, s = _tpfp(d, g, iou_thr)
        tps.append(tp)
        fps.append(fp)
        scores.append(s)
    if num_gts == 0:
        return None
    if not scores:
        return 0.0
    scores = np.concatenate(scores)
    order = np.argsort(-scores)
    tp = np.cumsum(np.concatenate(tps)[order])
    fp = np.cumsum(np.concatenate(fps)[order])
    recall = tp / num_gts
    precision = tp / np.maximum(tp + fp, 1e-9)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    inds = np.searchsorted(recall, _REC_POINTS, side="left")
    q = np.zeros(len(_REC_POINTS))
    ok = inds < len(precision)
    q[ok] = precision[inds[ok]]
    return float(np.mean(q))


def eval_lvis(
    det_results: Sequence[Sequence[np.ndarray]],
    annotations: Sequence[Dict],
    class_bands: Sequence[str],
    iou_thrs: Sequence[float] = tuple(np.arange(0.5, 0.96, 0.05)),
) -> Dict[str, float]:
    """LVIS federated AP.

    det_results: per image, per class, [N, 5] (x1 y1 x2 y2 score).
    annotations: per image dicts with ``bboxes`` [G, 4], ``labels`` [G], and
        (optionally) ``neg_labels`` / ``not_exhaustive_labels`` — label-space
        index lists from the LVIS image record. Absent lists mean "no
        information": images without gt for ``c`` and without ``c`` in
        ``neg_labels`` are excluded from ``c``'s evaluation.
    class_bands: per class, 'r'/'c'/'f' (see :func:`frequency_bands`).
    """
    num_classes = len(class_bands)
    per_class_ap: Dict[int, float] = {}
    for c in range(num_classes):
        cls_data = []
        num_gts = 0
        for dets, ann in zip(det_results, annotations):
            labels = np.asarray(ann["labels"])
            mask = labels == c
            has_gt = bool(mask.any())
            neg = c in set(ann.get("neg_labels", ()))
            not_exh = c in set(ann.get("not_exhaustive_labels", ()))
            if not ((has_gt and not not_exh) or neg):
                continue  # federated: image carries no signal for class c
            d = np.asarray(dets[c]).reshape(-1, 5)
            g = np.asarray(ann["bboxes"]).reshape(-1, 4)[mask]
            num_gts += len(g)
            cls_data.append((d, g))
        aps = [_class_ap(cls_data, num_gts, t) for t in iou_thrs]
        aps = [a for a in aps if a is not None]
        if aps:
            per_class_ap[c] = float(np.mean(aps))

    def band_mean(band):
        vals = [ap for c, ap in per_class_ap.items()
                if class_bands[c] == band]
        return float(np.mean(vals)) if vals else float("nan")

    out = {
        "AP": (float(np.mean(list(per_class_ap.values())))
               if per_class_ap else 0.0),
        "APr": band_mean("r"),
        "APc": band_mean("c"),
        "APf": band_mean("f"),
    }
    # AP50/AP75 for log parity with LVISEval's summary
    for name, t in (("AP50", 0.5), ("AP75", 0.75)):
        vals = []
        for c in range(num_classes):
            if c not in per_class_ap:
                continue
            cls_data = []
            num_gts = 0
            for dets, ann in zip(det_results, annotations):
                labels = np.asarray(ann["labels"])
                mask = labels == c
                neg = c in set(ann.get("neg_labels", ()))
                not_exh = c in set(ann.get("not_exhaustive_labels", ()))
                if not ((bool(mask.any()) and not not_exh) or neg):
                    continue
                cls_data.append(
                    (np.asarray(dets[c]).reshape(-1, 5),
                     np.asarray(ann["bboxes"]).reshape(-1, 4)[mask]))
                num_gts += int(mask.sum())
            a = _class_ap(cls_data, num_gts, t)
            if a is not None:
                vals.append(a)
        out[name] = float(np.mean(vals)) if vals else 0.0
    return out
