"""Pipeline formatting: assemble per-frame results into model-ready arrays.

Parity target: mmtracking/mmtrack/datasets/pipelines/formatting.py —
- ConcatVideoReferences (L8-75): dict[0] = key frame, dict[1] = refs stacked;
  ref gt arrays get a frame-index column prepended (L55-57).
- SeqDefaultFormatBundle (L141): to tensors with ``ref_`` key prefixing
  (L187-189). Here: numpy [T, H, W, C] float32 stacks (TPU-native layout is
  channels-last; DataContainers do not exist — static-shape arrays do).
- VideoCollect (L235): select img + meta keys (frame_id,
  num_left_ref_imgs, frame_stride, ...).
- MultiImagesToTensor (L79), ToList (L338).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ...registry import PIPELINES

DEFAULT_META_KEYS = (
    "filename", "ori_shape", "img_shape", "pad_shape", "scale_factor",
    "flip", "frame_id", "video_id", "is_video_data", "num_left_ref_imgs",
    "frame_stride", "img_norm_cfg",
)


@PIPELINES.register("VideoCollect")
class VideoCollect:
    def __init__(self, keys: Sequence[str],
                 meta_keys: Sequence[str] = DEFAULT_META_KEYS):
        self.keys = tuple(keys)
        self.meta_keys = tuple(meta_keys)

    def _collect(self, results: dict) -> dict:
        meta = {}
        for k in self.meta_keys:
            if k in results:
                meta[k] = results[k]
            elif k in results.get("img_info", {}):
                meta[k] = results["img_info"][k]
        out = {"img_metas": meta}
        for k in self.keys:
            if k in results:
                out[k] = results[k]
        return out

    def __call__(self, results):
        if isinstance(results, dict):
            return self._collect(results)
        return [self._collect(r) for r in results]


@PIPELINES.register("ConcatVideoReferences")
class ConcatVideoReferences:
    """[key, ref1, ref2, ...] -> [key_dict, concat_ref_dict]; ref gt arrays
    get a leading frame-index column (formatting.py:55-57)."""

    def __call__(self, results: List[dict]) -> List[dict]:
        assert len(results) >= 1
        key = results[0]
        refs = results[1:]
        if not refs:
            return [key]
        cat: Dict[str, object] = {}
        imgs = [r["img"] for r in refs]
        cat["img"] = np.stack(imgs, axis=0)  # [R, H, W, C]
        cat["img_metas"] = [r.get("img_metas", {}) for r in refs]
        for k in ("gt_bboxes", "gt_labels", "gt_instance_ids",
                  "gt_match_indices"):
            if k in refs[0]:
                rows = []
                for i, r in enumerate(refs):
                    v = np.asarray(r[k])
                    if v.ndim == 1:
                        v = v[:, None].astype(np.float32)
                    idx = np.full((v.shape[0], 1), i, v.dtype)
                    rows.append(np.concatenate([idx, v], axis=1))
                cat[k] = np.concatenate(rows, axis=0) if rows else np.zeros((0, 2))
        return [key, cat]


@PIPELINES.register("SeqDefaultFormatBundle")
class SeqDefaultFormatBundle:
    """[key_dict, ref_dict] -> one flat dict with ``ref_``-prefixed keys
    (formatting.py:141-189); images as float32 [T?, H, W, C]."""

    def __call__(self, results):
        assert isinstance(results, (list, tuple)) and len(results) in (1, 2)
        out = {}
        key = results[0]
        for k, v in key.items():
            if k == "img":
                v = np.ascontiguousarray(np.asarray(v, np.float32))
            out[k] = v
        if len(results) == 2:
            for k, v in results[1].items():
                if k == "img":
                    v = np.ascontiguousarray(np.asarray(v, np.float32))
                out[f"ref_{k}"] = v
        return out


@PIPELINES.register("DefaultFormatBundle")
class DefaultFormatBundle:
    def __call__(self, results: dict) -> dict:
        if "img" in results:
            results["img"] = np.ascontiguousarray(
                np.asarray(results["img"], np.float32)
            )
        return results


@PIPELINES.register("MultiImagesToTensor")
class MultiImagesToTensor:
    """Stack a list of per-frame dicts into one dict of [T, ...] arrays."""

    def __call__(self, results):
        if isinstance(results, dict):
            return DefaultFormatBundle()(results)
        out = {}
        out["img"] = np.stack(
            [np.asarray(r["img"], np.float32) for r in results], axis=0
        )
        out["img_metas"] = [r.get("img_metas", {}) for r in results]
        return out


@PIPELINES.register("ToList")
class ToList:
    def __call__(self, results):
        return list(results) if not isinstance(results, list) else results
