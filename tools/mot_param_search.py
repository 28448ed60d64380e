#!/usr/bin/env python
"""Grid-search tracker hyperparameters over a test set
(reference: tools/mot_param_search.py)."""
import argparse, itertools, json, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--results-file", required=True,
                   help="json: per-frame track_bboxes from a prior run")
    p.add_argument("--score-thrs", nargs="*", type=float, default=[0.3, 0.5, 0.7])
    p.add_argument("--iou-thrs", nargs="*", type=float, default=[0.3, 0.5])
    args = p.parse_args()

    from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
        MOTChallengeDataset,
    )

    ds = MOTChallengeDataset(ann_file=args.ann_file, test_mode=True)
    raw = json.load(open(args.results_file))
    best = None
    for st, it in itertools.product(args.score_thrs, args.iou_thrs):
        results = []
        for fr in raw:
            tb = np.asarray(fr.get("track_bboxes", []), np.float64).reshape(-1, 6)
            results.append(dict(track_bboxes=tb[tb[:, 5] >= st]))
        m = ds.evaluate(results, iou_thr=it)
        print(f"score_thr={st} iou_thr={it} -> MOTA={m['MOTA']:.4f} "
              f"IDF1={m['IDF1']:.4f}")
        if best is None or m["MOTA"] > best[0]:
            best = (m["MOTA"], st, it)
    print(f"best: MOTA={best[0]:.4f} @ score_thr={best[1]} iou_thr={best[2]}")


if __name__ == "__main__":
    main()
