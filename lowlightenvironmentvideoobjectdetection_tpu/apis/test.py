"""Evaluation loops over video datasets.

Parity targets: mmtracking/mmtrack/apis/test.py:14-122 (``single_gpu_test`` /
``multi_gpu_test``) driven through tools/test.py. Differences by design:
- the streaming memo is an explicit jax carry inside the compiled step, so
  the loop here is a plain host iteration feeding frames in video order;
- at frame 0 the dataset's ``test_with_adaptive_stride`` sampler output (the
  ref frame infos the reference loads via its pipeline,
  coco_video_dataset.py:198-218) is loaded and fed as the reference memo —
  NOT the frame-0-replication fallback;
- multi-"GPU" sharding = ``distributed_video_split`` whole-video chunks; in a
  single program there is no pickle-file gather (apis/test.py:125-173) — the
  shard results are plain lists concatenated in order.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _prepare_one(ds, pipe, img_info, ann=None):
    """Run one image through the (test) pipeline."""
    d = dict(img_info=dict(img_info), img_prefix=ds.img_prefix)
    if ann is not None:
        d["ann"] = ann
    return pipe(d)


def single_device_test(
    model,
    ds,
    pipe,
    indices: Optional[Sequence[int]] = None,
    with_ann: bool = True,
    progress_fn=None,
) -> Tuple[List[List[np.ndarray]], List[Dict]]:
    """Stream the dataset (in video order) through a VIDModel.

    Returns (det_lists, annotations): per-frame per-class [N, 5] arrays in
    ORIGINAL image coordinates (rescale=True semantics), plus the matching
    gt dicts for ``eval_map``.

    The dataset must be built test_mode=True with its configured
    ``ref_img_sampler`` so frame 0 carries the adaptive-stride (or
    fix-stride) reference infos.
    """
    det_lists: List[List[np.ndarray]] = []
    annotations: List[Dict] = []
    indices = list(indices) if indices is not None else list(range(len(ds)))
    # Per-video cache of pipeline-prepared reference frames. The
    # adaptive-stride sampler's frame-0 refs span the whole video, so every
    # ref would otherwise be pipeline-processed twice: once at frame 0 for
    # the memo and again when it arrives as a streamed frame. Test pipelines
    # are deterministic and annotation-independent (gts are read from the
    # dataset, not the pipeline output), so the prepared dict is reusable.
    ref_cache: Dict[str, dict] = {}
    for n, i in enumerate(indices):
        s = ds[i]
        info = s["img_info"]
        fid = info.get("frame_id", 0)
        if fid == 0:
            ref_cache = {}
        r = ref_cache.pop(info.get("filename", info.get("file_name")), None)
        if r is None:
            r = _prepare_one(ds, pipe, info, s.get("ann"))
        ref_imgs = None
        if fid == 0 and s.get("ref_img_infos"):
            key0 = info.get("filename", info.get("file_name"))
            if key0 is not None:
                ref_cache[key0] = r
            refs = []
            for ri in s["ref_img_infos"]:
                key = ri.get("filename", ri.get("file_name"))
                pr = ref_cache.get(key)
                if pr is None:
                    pr = _prepare_one(ds, pipe, ri)
                if key is not None:
                    ref_cache[key] = pr
                refs.append(pr["img"])
            ref_imgs = np.stack([np.asarray(x, np.float32) for x in refs])
            ref_cache.pop(key0, None)
        # VideoCollect nests the pipeline meta under img_metas (the
        # reference's DataContainer meta); read through it so rescale=True
        # actually rescales when the test pipeline resized the frame.
        meta = r.get("img_metas") or {}
        out = model.inference_vid_prepared(
            np.asarray(r["img"], np.float32),
            img_shape=r.get("img_shape", meta.get("img_shape")),
            scale_factor=r.get("scale_factor", meta.get("scale_factor")),
            frame_id=fid,
            ref_imgs=ref_imgs,
        )
        det_lists.append(out["bbox_results"])
        if with_ann and "ann" in s:
            annotations.append(
                dict(bboxes=s["ann"]["bboxes"], labels=s["ann"]["labels"])
            )
        if progress_fn:
            progress_fn(n + 1, len(indices))
    return det_lists, annotations


def multi_device_test(
    model, ds, pipe, num_shards: int, shard: Optional[int] = None, **kw
) -> Tuple[List[List[np.ndarray]], List[Dict], List[int]]:
    """Whole-video sharded eval (DistributedVideoSampler semantics,
    distributed_video_sampler.py:24-45). With ``shard=None`` runs every shard
    locally in sequence (single-program equivalent of the rank loop) and
    returns results in dataset order."""
    from ..data.datasets import distributed_video_split

    splits = distributed_video_split(ds.data_infos, num_shards)
    shards = [shard] if shard is not None else range(num_shards)
    det_lists: List[List[np.ndarray]] = []
    annotations: List[Dict] = []
    indices: List[int] = []
    for k in shards:
        d, a = single_device_test(model, ds, pipe, indices=splits[k], **kw)
        det_lists.extend(d)
        annotations.extend(a)
        indices.extend(splits[k])
    return det_lists, annotations, indices


def evaluate_bbox(det_lists, annotations, iou_thr: float = 0.5) -> Dict[str, float]:
    """COCO-style AP@iou over the streamed results (dataset.evaluate shape)."""
    from ..core.eval.mean_ap import eval_map

    mAP, _ = eval_map(det_lists, annotations, iou_thr=iou_thr)
    return {"mAP50" if iou_thr == 0.5 else f"mAP{int(iou_thr*100)}": float(mAP)}
