#!/usr/bin/env python
"""Config-driven evaluation CLI.

Parity target: mmtracking/tools/test.py — build the test dataset (per-video
sharded), stream every video through the compiled inference step, evaluate
(bbox mAP / CLEAR-MOT). ``--synthetic N`` evaluates on generated clips so the
full loop runs without data on disk.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Test a video detector")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--eval", nargs="*", default=["bbox"])
    p.add_argument("--synthetic", type=int, default=0,
                   help="evaluate on N synthetic frames instead of a dataset")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--out", default=None, help="dump results json")
    p.add_argument("--num-shards", type=int, default=1,
                   help="whole-video shards (DistributedVideoSampler split)")
    p.add_argument("--shard", type=int, default=None,
                   help="run only this shard (default: all, in order)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        init_model,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.config import (
        Config, apply_cli_options,
    )

    cfg = Config.fromfile(args.config)
    apply_cli_options(cfg, args.cfg_options)

    import jax.numpy as jnp

    mcfg = dict(cfg["model"])
    mtype = mcfg.pop("type")
    if args.tiny:
        mcfg.update(pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=32,
                    test_nms_pre=64, test_nms_post=16, num_roi_samples=16,
                    compute_dtype=jnp.float32)
    if mtype not in ("SELSA", "FGFA", "DFF", "FasterRCNN"):
        # darkfarm-family models stream their noisy branch through SELSA
        mcfg.setdefault("out_indices", (3,))
        mcfg.pop("loss_type", None)
        mcfg.pop("in_channels", None)
        mtype = "SELSA"

    # ref method from the test dataset's sampler config
    sampler = (cfg["data"].get("test") or {}).get("ref_img_sampler") or {}
    method = sampler.get("method", "test_with_adaptive_stride")
    if method == "test_with_fix_stride":
        mcfg.setdefault("ref_method", "fix")
        mcfg.setdefault("frame_stride", sampler.get("stride", 1))
        fr = sampler.get("frame_range", [-7, 7])
        mcfg.setdefault("num_ref_frames",
                        abs(fr[0]) + fr[1] if isinstance(fr, list) else 14)
    model = init_model(model_type=mtype, checkpoint=args.checkpoint, **mcfg)

    results = []
    t0 = time.perf_counter()
    if args.synthetic:
        rng = np.random.RandomState(0)
        h, w = model.cfg.pad_h, model.cfg.pad_w
        for fid in range(args.synthetic):
            frame = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
            r = model.inference_vid(frame, fid)
            results.append(
                dict(frame_id=fid,
                     num_dets=int(sum(len(x) for x in r["bbox_results"])))
            )
    else:
        from lowlightenvironmentvideoobjectdetection_tpu.apis.test import (
            multi_device_test,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.data.datasets import (
            DarkFarmVIDDataset, ImagenetVIDDataset,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines import (
            Compose,
        )

        dcfg = cfg["data"]["test"]
        ds_cls = {"ImagenetVIDDataset": ImagenetVIDDataset,
                  "DarkFarmVIDDataset": DarkFarmVIDDataset}[dcfg["type"]]
        # the configured ref sampler makes frame 0 carry the adaptive/fix
        # stride reference infos the memo is built from
        ds = ds_cls(ann_file=dcfg["ann_file"],
                    img_prefix=dcfg.get("img_prefix", ""), test_mode=True,
                    ref_img_sampler=dict(dcfg.get("ref_img_sampler") or {})
                    or None)
        pipe = Compose(dcfg["pipeline"])
        det_lists, annotations, indices = multi_device_test(
            model, ds, pipe, num_shards=args.num_shards, shard=args.shard,
        )
        for i, d in zip(indices, det_lists):
            fid = ds.data_infos[i].get("frame_id", i)
            results.append(dict(frame_id=fid,
                                bbox_results=[b.tolist() for b in d]))
    dt = time.perf_counter() - t0
    fps = len(results) / dt if dt > 0 else 0.0
    summary = dict(frames=len(results), fps=round(fps, 2), eval=args.eval)
    if "bbox" in args.eval and not args.synthetic and results:
        from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
            eval_map,
        )

        mAP, _ = eval_map(det_lists, annotations, iou_thr=0.5)
        summary["mAP50"] = round(float(mAP), 4)
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(summary=summary, results=results), f)


if __name__ == "__main__":
    main()
