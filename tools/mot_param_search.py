#!/usr/bin/env python
"""Grid-search TRACKER hyperparameters — rebuilding the tracker per grid
point (reference: tools/mot_param_search.py:1-217).

The reference enumerates every list-valued field of ``cfg.model.tracker``
(``get_search_params``), builds a fresh tracker per combination and re-runs
the whole test set. TPU-split version of the same search: the detector+ReID
half (the expensive compiled part) runs ONCE — per-frame detections, scores,
labels and ReID embeddings are read from a saved results json (produced by
``tools/test.py --out`` or ``--save-dets``) — and the host-side association
(SortTracker: Kalman + LAP), which is what the hyperparameters actually
steer, is rebuilt and re-run per grid point. Any SortTracker ctor field can
be searched (obj_score_thr, reid_sim_thr, match_iou_thr, num_tentatives,
num_frames_retain, momentums), not just post-hoc score thresholds.

Usage:
  python tools/mot_param_search.py --ann-file ann.json --dets dets.json \
      --search obj_score_thr=0.3,0.5 match_iou_thr=0.5,0.7 \
               num_tentatives=1,3 \
      --search-metrics MOTA IDF1
"""
import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_search(items):
    """'key=v1,v2,...' -> {key: [typed values]} (the reference's
    get_search_params over list-valued tracker cfg fields)."""
    out = {}
    for item in items:
        k, _, vs = item.partition("=")
        vals = []
        for v in vs.split(","):
            try:
                vals.append(int(v))
            except ValueError:
                try:
                    vals.append(float(v))
                except ValueError:
                    vals.append(v)
        out[k] = vals
    return out


def run_tracker(dataset, frames, tracker_kw):
    """Fresh tracker per video (reference rebuilds per combination and the
    model resets it at frame_id==0); returns per-frame results."""
    from lowlightenvironmentvideoobjectdetection_tpu.models.mot.trackers import (
        SortTracker,
    )

    tracker = SortTracker(**tracker_kw)
    results = []
    for info, det in zip(dataset.data_infos, frames):
        frame_id = info.get("frame_id", 0)
        if frame_id == 0:
            tracker.reset()
        bboxes = np.asarray(det.get("det_bboxes", []), np.float32).reshape(-1, 4)
        scores = np.asarray(det.get("det_scores", [0.0] * len(bboxes)),
                            np.float32).reshape(-1)
        labels = np.asarray(det.get("det_labels", [0] * len(bboxes)),
                            np.int64).reshape(-1)
        embeds = det.get("embeds")
        if embeds is not None:
            embeds = np.asarray(embeds, np.float32).reshape(len(bboxes), -1)
        ids, keep = tracker.track(frame_id, bboxes, scores, labels, embeds)
        keep = keep & (ids >= 0)
        tb = np.concatenate(
            [ids[keep, None].astype(np.float64), bboxes[keep],
             scores[keep, None].astype(np.float64)], axis=1)
        results.append(dict(track_bboxes=tb))
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--dets", required=True,
                   help="json: per-frame det_bboxes/det_scores/det_labels"
                        "(/embeds) from one detector+ReID pass")
    p.add_argument("--search", nargs="+", default=["obj_score_thr=0.3,0.5"],
                   help="key=v1,v2 pairs over SortTracker ctor fields")
    p.add_argument("--search-metrics", nargs="+", default=["MOTA", "IDF1"])
    p.add_argument("--iou-thr", type=float, default=0.5,
                   help="CLEAR-MOT matching IoU")
    p.add_argument("--log", default=None)
    args = p.parse_args()

    from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
        MOTChallengeDataset,
    )

    ds = MOTChallengeDataset(ann_file=args.ann_file, test_mode=True)
    frames = json.load(open(args.dets))
    assert len(frames) == len(ds.data_infos), (
        f"{len(frames)} saved frames vs {len(ds.data_infos)} dataset frames")

    search = parse_search(args.search)
    combos = list(itertools.product(*search.values()))
    print(f"Totally {len(combos)} cases over {sorted(search)}.")

    log = open(args.log, "w") if args.log else None
    best = None
    for combo in combos:
        kw = dict(zip(search.keys(), combo))
        results = run_tracker(ds, frames, kw)
        m = ds.evaluate(results, iou_thr=args.iou_thr)
        rec = " ".join(f"{k}={m[k]:.3f}" if isinstance(m[k], float)
                       else f"{k}={m[k]}" for k in args.search_metrics)
        line = f"{kw}: {rec}"
        print(line)
        if log:
            log.write(line + "\n")
        key = m[args.search_metrics[0]]
        if best is None or key > best[0]:
            best = (key, kw, m)
    print(f"best {args.search_metrics[0]}={best[0]:.4f} @ {best[1]}")
    if log:
        log.close()


if __name__ == "__main__":
    main()
