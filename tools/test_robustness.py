#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Corruption-robustness benchmark.

The analog of mmdetection tools/analysis_tools/test_robustness.py: evaluate
a detector's mAP across image corruptions x severities and report mPC (mean
performance under corruption) alongside the clean-image P.

Runs the single-image detector path (FasterRCNN-style families) over the
config's test dataset with a ``Corrupt`` transform injected after loading.
"""
import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--corruptions", nargs="*",
                   default=["gaussian_noise", "motion_blur", "contrast"])
    p.add_argument("--severities", nargs="*", type=int, default=[1, 3, 5])
    p.add_argument("--max-images", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        DetectorModel,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.config import Config
    from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
        eval_map,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines import (
        Compose,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.registry import DATASETS

    cfg = Config.fromfile(args.config)
    mcfg = dict(cfg["model"])
    mtype = mcfg.pop("type")
    det = DetectorModel(model_type=mtype, **mcfg)
    if args.checkpoint:
        from lowlightenvironmentvideoobjectdetection_tpu.utils.checkpoint import (
            load_checkpoint,
        )

        det.params = load_checkpoint(args.checkpoint)

    vcfg = cfg["data"].get("val") or cfg["data"]["test"]
    ds = DATASETS.get(vcfg["type"])(
        ann_file=vcfg["ann_file"], img_prefix=vcfg.get("img_prefix", ""),
        test_mode=True)

    load_pipe = Compose([dict(type="LoadImageFromFile")])

    def run(corruption=None, severity=1):
        corrupt = (Compose([dict(type="Corrupt", corruption=corruption,
                                 severity=severity)])
                   if corruption is not None else None)
        det_lists, anns = [], []
        n = min(len(ds), args.max_images)
        for i in range(n):
            s = ds[i]
            out = load_pipe(dict(img_info=s["img_info"], ann=s["ann"],
                                 img_prefix=ds.img_prefix))
            if corrupt is not None:
                out = corrupt(out)
            dets = det.inference_detector(np.asarray(out["img"], np.float32))
            det_lists.append(dets)
            anns.append(s["ann"])
        mean_ap, _ = eval_map(det_lists, anns)
        return float(mean_ap)

    clean = run()
    rows = {}
    for c in args.corruptions:
        for s in args.severities:
            rows[f"{c}_s{s}"] = round(run(c, s), 4)
    mpc = float(np.mean(list(rows.values()))) if rows else 0.0
    print(json.dumps(dict(P_clean=round(clean, 4), mPC=round(mpc, 4),
                          per_corruption=rows)))


if __name__ == "__main__":
    main()
