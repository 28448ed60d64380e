"""Video detection datasets: key/reference frame sampling over COCO-VID.

Parity targets:
- CocoVideoDataset: mmtracking/mmtrack/datasets/coco_video_dataset.py:13 —
  key-frame interval sampling, the four ref-frame sampling methods
  ('uniform', 'bilateral_uniform', 'test_with_adaptive_stride',
  'test_with_fix_stride', L94-232 incl. the local ``keep_samples_length``
  repeat-padding), annotation parsing with instance ids.
- ImagenetVIDDataset: imagenet_vid_dataset.py:9 (30 classes,
  ``is_vid_train_frame`` filtering).
- DarkFarmVIDDataset: darkfarm_vid_dataset.py:9 (8 farm classes).
- DistributedVideoSampler: datasets/samplers/distributed_video_sampler.py:5 —
  whole-video sharding so streaming memos stay shard-local.

Host-side numpy only; device work happens in ``data.preprocess``.
"""

from __future__ import annotations

import random as pyrandom
from typing import Dict, List, Optional, Sequence

import numpy as np

from .coco_vid import CocoVID

IMAGENET_VID_CLASSES = (
    "airplane", "antelope", "bear", "bicycle", "bird", "bus", "car",
    "cattle", "dog", "domestic_cat", "elephant", "fox", "giant_panda",
    "hamster", "horse", "lion", "lizard", "monkey", "motorcycle", "rabbit",
    "red_panda", "sheep", "snake", "squirrel", "tiger", "train", "turtle",
    "watercraft", "whale", "zebra",
)

DARKFARM_CLASSES = (
    "person", "cow", "sheep", "dog", "rabbit", "cat", "hen", "duck",
)


class CocoVideoDataset:
    """COCO-VID dataset with reference-frame sampling.

    Samples are dicts of host numpy arrays; the train/test pipelines and
    device transfer live elsewhere.
    """

    CLASSES: Sequence[str] = ()

    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        key_img_interval: int = 1,
        ref_img_sampler: Optional[Dict] = None,
        test_mode: bool = False,
        classes: Optional[Sequence[str]] = None,
        filter_empty_gt: bool = True,
    ):
        self.coco = CocoVID(ann_file)
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.ref_img_sampler = ref_img_sampler
        if classes is not None:
            self.CLASSES = tuple(classes)
        self.cat_ids = self.coco.get_cat_ids(self.CLASSES or None)
        self.cat2label = {c: i for i, c in enumerate(self.cat_ids)}

        self.data_infos: List[dict] = []
        for vid_id in self.coco.get_vid_ids():
            img_ids = self.coco.get_img_ids_from_vid(vid_id)[::key_img_interval]
            for img_id in img_ids:
                info = dict(self.coco.load_imgs([img_id])[0])
                info["filename"] = info.get("file_name")
                self.data_infos.append(info)
        if not test_mode and filter_empty_gt:
            self.data_infos = [
                d for d in self.data_infos
                if len(self.coco.img_to_anns[d["id"]]) > 0
                and d.get("is_vid_train_frame", True)
            ]

    def __len__(self):
        return len(self.data_infos)

    # -- reference sampling (coco_video_dataset.py:94-232 semantics) --------

    def ref_img_sampling(
        self,
        img_info: dict,
        frame_range,
        stride: int = 1,
        num_ref_imgs: int = 1,
        filter_key_img: bool = True,
        method: str = "uniform",
        keep_samples_length: bool = True,
        rng: Optional[pyrandom.Random] = None,
    ) -> List[dict]:
        """Returns the ref image infos (sorted by frame_id), key excluded."""
        rng = rng or pyrandom
        if isinstance(frame_range, int):
            frame_range = [-frame_range, frame_range]

        frame_id = img_info.get("frame_id", -1)
        if frame_id < 0 or (frame_range[0] == 0 and frame_range[1] == 0):
            return [dict(img_info) for _ in range(num_ref_imgs)]

        vid_id, img_id = img_info["video_id"], img_info["id"]
        img_ids = self.coco.get_img_ids_from_vid(vid_id)
        left = max(0, frame_id + frame_range[0])
        right = min(frame_id + frame_range[1], len(img_ids) - 1)

        ref_img_ids: List[int] = []
        if method == "uniform":
            valid = list(img_ids[left:right + 1])
            if filter_key_img and img_id in valid and len(valid) > 1:
                valid.remove(img_id)
            if keep_samples_length and num_ref_imgs > len(valid):
                extra = rng.choices(valid, k=num_ref_imgs - len(valid))
                ref_img_ids.extend(sorted(valid + extra))
            else:
                ref_img_ids.extend(rng.sample(valid, min(num_ref_imgs, len(valid))))
        elif method == "bilateral_uniform":
            assert num_ref_imgs % 2 == 0
            for mode in ("left", "right"):
                if mode == "left":
                    valid = list(img_ids[left:frame_id + 1])
                else:
                    valid = list(img_ids[frame_id:right + 1])
                if filter_key_img and img_id in valid and len(valid) > 1:
                    valid.remove(img_id)
                half = num_ref_imgs // 2
                if keep_samples_length and half > len(valid):
                    extra = rng.choices(valid, k=half - len(valid))
                    ref_img_ids.extend(sorted(valid + extra))
                else:
                    ref_img_ids.extend(rng.sample(valid, min(half, len(valid))))
        elif method == "test_with_adaptive_stride":
            if frame_id == 0:
                s = float(len(img_ids) - 1) / max(num_ref_imgs - 1, 1)
                for i in range(num_ref_imgs):
                    ref_img_ids.append(img_ids[round(i * s)])
        elif method == "test_with_fix_stride":
            if frame_id == 0:
                for _ in range(frame_range[0], 1):
                    ref_img_ids.append(img_ids[0])
                for i in range(1, frame_range[1] + 1):
                    ref_img_ids.append(img_ids[min(round(i * stride), len(img_ids) - 1)])
            elif frame_id % stride == 0:
                ref_img_ids.append(
                    img_ids[min(round(frame_id + frame_range[1] * stride),
                                len(img_ids) - 1)]
                )
            img_info["num_left_ref_imgs"] = abs(frame_range[0])
            img_info["frame_stride"] = stride
        else:
            raise NotImplementedError(method)

        infos = [dict(self.coco.load_imgs([i])[0]) for i in ref_img_ids]
        for inf in infos:
            inf["filename"] = inf.get("file_name")
        return sorted(infos, key=lambda i: i.get("frame_id", 0))

    # -- annotations ---------------------------------------------------------

    def get_ann_info(self, img_info: dict) -> Dict[str, np.ndarray]:
        """xyxy boxes, labels, instance ids for one image."""
        anns = self.coco.img_to_anns[img_info["id"]]
        boxes, labels, ins_ids = [], [], []
        for a in anns:
            if a.get("iscrowd", 0) or a.get("ignore", 0):
                continue
            if a["category_id"] not in self.cat2label:
                continue
            x, y, w, h = a["bbox"]
            if w < 1 or h < 1:
                continue
            boxes.append([x, y, x + w, y + h])
            labels.append(self.cat2label[a["category_id"]])
            ins_ids.append(a.get("instance_id", -1))
        return dict(
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            instance_ids=np.asarray(ins_ids, np.int64),
        )

    def __getitem__(self, idx: int) -> dict:
        info = dict(self.data_infos[idx])
        sample = dict(img_info=info, ann=self.get_ann_info(info))
        if self.ref_img_sampler is not None:
            refs = self.ref_img_sampling(info, **self.ref_img_sampler)
            sample["ref_img_infos"] = refs
            if not self.test_mode:
                sample["ref_anns"] = [self.get_ann_info(r) for r in refs]
        return sample


class ImagenetVIDDataset(CocoVideoDataset):
    CLASSES = IMAGENET_VID_CLASSES


class DarkFarmVIDDataset(CocoVideoDataset):
    CLASSES = DARKFARM_CLASSES


def distributed_video_split(
    data_infos: Sequence[dict], num_shards: int
) -> List[List[int]]:
    """Split test indices by whole videos across shards
    (distributed_video_sampler.py:24-45): chunk the sorted first-frame
    indices so every shard owns complete videos."""
    first_frames = [
        i for i, d in enumerate(data_infos) if d.get("frame_id", 0) == 0
    ]
    chunks = np.array_split(first_frames, num_shards)
    splits: List[List[int]] = []
    for k, chunk in enumerate(chunks):
        start = int(chunk[0]) if len(chunk) else len(data_infos)
        if k == num_shards - 1:
            end = len(data_infos)
        else:
            nxt = chunks[k + 1]
            end = int(nxt[0]) if len(nxt) else len(data_infos)
        splits.append(list(range(start, end)))
    return splits
