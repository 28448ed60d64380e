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


def _load_frame(info, img_prefix, pad_hw=None):
    """Load a frame; a missing file becomes a zeros canvas of the annotated
    size (keeps the route runnable on annotation-only fixtures)."""
    path = os.path.join(img_prefix or "",
                        info.get("file_name") or info.get("filename", ""))
    if os.path.exists(path):
        try:
            import cv2

            img = cv2.imread(path)
            if img is not None:
                return np.asarray(img, np.float32)
        except ImportError:
            from PIL import Image

            return np.asarray(Image.open(path).convert("RGB"), np.float32)
    h = int(info.get("height", pad_hw[0] if pad_hw else 64))
    w = int(info.get("width", pad_hw[1] if pad_hw else 64))
    return np.zeros((h, w, 3), np.float32)


def run_mot_eval(args, cfg, mtype, mcfg):
    """MOT tracking evaluation (reference tools/test.py --eval track:
    MOTChallengeDataset streamed through DeepSORT/Tracktor, then CLEAR-MOT
    via dataset.evaluate, mot_challenge_dataset.py:212)."""
    import jax.numpy as jnp

    from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
    from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
        MOTChallengeDataset,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.data.preprocess import (
        prepare_frames,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

    tcfg = dict(cfg.get("tracker") or {})
    if args.tiny:
        mcfg.update(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                    compute_dtype=jnp.float32)
    if mtype == "Tracktor":
        mcfg.setdefault("with_cmc", bool(tcfg.pop("with_cmc", False)))
        mcfg.setdefault("with_linear_motion",
                        bool(tcfg.pop("with_linear_motion", False)))
    model = MODELS.get(mtype)(**mcfg)
    # tracker hyperparams from the config (mot_param_search surface); config
    # keys use the reference names — map onto the tracker ctor
    alias = {"reid_thr": "reid_sim_thr", "iou_thr": "match_iou_thr"}
    kw = {alias.get(k, k): v for k, v in tcfg.items()
          if alias.get(k, k) in type(model.tracker).__init__.__code__.co_varnames}
    if kw:
        model.tracker = type(model.tracker)(**kw)

    dcfg = cfg["data"]["test"]
    ds = MOTChallengeDataset(
        ann_file=dcfg["ann_file"], img_prefix=dcfg.get("img_prefix", ""),
        test_mode=True, detection_file=dcfg.get("detection_file"))
    pad_hw = (model.detector.cfg.pad_h, model.detector.cfg.pad_w)

    results = []
    t0 = time.perf_counter()
    for i, info in enumerate(ds.data_infos):
        img = _load_frame(info, ds.img_prefix, pad_hw)
        imgs, img_shape, sf = prepare_frames(img[None], *pad_hw)
        public = None
        if ds.detections is not None:
            public = np.asarray(ds.detections[i], np.float32).reshape(-1, 5)
        r = model.track_frame(info.get("frame_id", i), imgs[0],
                              np.asarray(img_shape), public_bboxes=public)
        results.append(r)
    dt = time.perf_counter() - t0
    summary = dict(frames=len(results),
                   fps=round(len(results) / dt, 2) if dt > 0 else 0.0,
                   model=mtype, eval=args.eval)
    if "track" in args.eval:
        summary["track"] = {k: round(float(v), 4)
                            for k, v in ds.evaluate(results).items()}
    if args.out:
        out_dir = os.path.dirname(args.out) or "."
        ds.format_results(results, os.path.join(out_dir, "mot_results"))
    print(json.dumps(summary))
    return summary


def run_sot_eval(args, cfg, mcfg):
    """SOT OPE evaluation (reference tools/test.py on LaSOT: SiamRPN++
    one-pass tracking, success/precision via eval_sot_ope)."""
    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        init_sot_model,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
        LaSOTDataset,
    )

    if args.tiny:
        # smallest sizes the 7x7 center template crop allows (stride 8)
        mcfg.setdefault("exemplar_size", 64)
        mcfg.setdefault("search_size", 128)
    model = init_sot_model(checkpoint=args.checkpoint, **mcfg)

    dcfg = cfg["data"]["test"]
    ds = LaSOTDataset(ann_file=dcfg["ann_file"],
                      img_prefix=dcfg.get("img_prefix", ""), test_mode=True)
    results = []
    t0 = time.perf_counter()
    nframes = 0
    for v in range(ds.num_videos):
        video = ds.get_video(v)
        gt = video["gt_bboxes"]
        boxes = []
        for t, info in enumerate(video["frames"]):
            img = _load_frame(info, ds.img_prefix)
            if t == 0:
                init = gt[0] if not np.isnan(gt[0]).any() else \
                    np.asarray([0.0, 0.0, 16.0, 16.0], np.float32)
                r = model.inference_sot(img, init, 0)
            else:
                r = model.inference_sot(img, None, t)
            boxes.append(np.asarray(r["track_bboxes"][:4], np.float32))
            nframes += 1
        results.append(np.stack(boxes))
    dt = time.perf_counter() - t0
    summary = dict(frames=nframes,
                   fps=round(nframes / dt, 2) if dt > 0 else 0.0,
                   model="SiamRPN", eval=args.eval)
    summary["sot"] = {k: round(float(v), 4)
                      for k, v in ds.evaluate(results).items()}
    print(json.dumps(summary))
    return summary


def run_image_detector(args, cfg, mtype, mcfg):
    """Evaluate an image-detector config (reference mmdetection/tools/test.py
    single_gpu_test + dataset.evaluate): per-image detect through the
    family's adapter, then mAP50."""
    import jax.numpy as jnp

    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
        DetectorModel,
    )

    det = DetectorModel(model_type=mtype, tiny=args.tiny, **mcfg)
    if args.checkpoint:
        from lowlightenvironmentvideoobjectdetection_tpu.utils.checkpoint import (
            load_checkpoint,
        )

        det.params = load_checkpoint(args.checkpoint)

    results = []
    det_lists, anns = [], []
    t0 = time.perf_counter()
    if args.synthetic:
        rng = np.random.RandomState(0)
        h, w = det.pad_h, det.pad_w
        for i in range(args.synthetic):
            img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
            r = det.inference_detector(img)
            results.append(dict(image=i,
                                num_dets=int(sum(len(x) for x in r))))
    else:
        from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines import (
            Compose,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.registry import (
            DATASETS,
        )

        dcfg = cfg["data"]["test"]
        ds = DATASETS.get(dcfg["type"])(
            ann_file=dcfg["ann_file"], img_prefix=dcfg.get("img_prefix", ""),
            test_mode=True)
        load_pipe = Compose([dict(type="LoadImageFromFile")])
        for i in range(len(ds)):
            s = ds[i]
            out = load_pipe(dict(img_info=s["img_info"], ann=s["ann"],
                                 img_prefix=ds.img_prefix))
            r = det.inference_detector(np.asarray(out["img"], np.float32))
            det_lists.append(r)
            anns.append(s["ann"])
            results.append(dict(image=i, bbox_results=[b.tolist() for b in r]))
    dt = time.perf_counter() - t0
    fps = len(results) / dt if dt > 0 else 0.0
    summary = dict(frames=len(results), fps=round(fps, 2), eval=args.eval,
                   model=mtype)
    if "bbox" in args.eval and det_lists:
        from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
            eval_map,
        )

        mAP, _ = eval_map(det_lists, anns, iou_thr=0.5)
        summary["mAP50"] = round(float(mAP), 4)
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(summary=summary, results=results), f)
    return summary


def main():
    # honor JAX_PLATFORMS even though sitecustomize pre-imports jax with the
    # axon (TPU tunnel) platform: the env var alone is too late by then
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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

    # image-detector route (reference mmdetection/tools/test.py): any family
    # with an inference adapter whose test data is image-style (or synthetic)
    from lowlightenvironmentvideoobjectdetection_tpu.apis.families import (
        get_family,
    )

    VIDEO_DS = {"ImagenetVIDDataset", "DarkFarmVIDDataset",
                "CocoVideoDataset", "MOTChallengeDataset", "LaSOTDataset",
                "SOTTrainDataset"}
    dcfg_probe = (cfg.get("data") or {}).get("test") or {}
    is_video_data = dcfg_probe.get("type") in VIDEO_DS
    fam = get_family(mtype)
    # MOT tracking route (--eval track): DeepSORT/Tracktor over
    # MOTChallengeDataset -> CLEAR-MOT
    if mtype in ("DeepSORT", "Tracktor") \
            or dcfg_probe.get("type") == "MOTChallengeDataset":
        return run_mot_eval(args, cfg, mtype, mcfg)
    # SOT route: SiamRPN over LaSOT -> OPE success/precision
    if mtype == "SiamRPN" or dcfg_probe.get("type") == "LaSOTDataset":
        return run_sot_eval(args, cfg, mcfg)
    if fam is not None and mtype not in ("SELSA", "FGFA", "DFF") \
            and not is_video_data:
        return run_image_detector(args, cfg, mtype, mcfg)

    if args.tiny:
        mcfg.update(pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=32,
                    test_nms_pre=64, test_nms_post=16, num_roi_samples=16,
                    compute_dtype=jnp.float32)
    if mtype not in ("SELSA", "FGFA", "DFF", "FasterRCNN"):
        # darkfarm-family models stream their noisy branch through SELSA
        # with the SAME architecture knobs (variant backbone / RAW stem /
        # troi); only train-only keys are dropped
        mcfg["out_indices"] = (3,)
        mcfg.pop("loss_type", None)
        in_ch = mcfg.pop("in_channels", None)
        if in_ch and in_ch != 3:
            mcfg.setdefault("backbone_in_channels", in_ch)
        for k in ("with_aggregator", "agg_rdb", "agg_taf", "dual_branch",
                  "denoiser", "with_cleaner"):
            mcfg.pop(k, None)
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
