"""Tests for MOTChallengeDataset / LaSOTDataset / SOTTrainDataset."""

import json
import random

import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
    LaSOTDataset,
    MOTChallengeDataset,
    SOTTrainDataset,
)


def _mot_json(tmp_path, n_frames=4):
    images, anns = [], []
    img_id = ann_id = 0
    for fid in range(n_frames):
        img_id += 1
        images.append(dict(id=img_id, video_id=1, frame_id=fid,
                           file_name=f"img1/{fid + 1:06d}.jpg",
                           width=640, height=480))
        # two pedestrians moving right
        for tid in (1, 2):
            ann_id += 1
            x = 50 + 10 * fid + 100 * tid
            anns.append(dict(id=ann_id, image_id=img_id, category_id=1,
                             bbox=[x, 100, 40, 80], area=3200, iscrowd=0,
                             instance_id=tid, visibility=1.0))
    data = dict(videos=[dict(id=1, name="MOT17-02")], images=images,
                annotations=anns,
                categories=[dict(id=1, name="pedestrian")])
    path = tmp_path / "mot.json"
    path.write_text(json.dumps(data))
    return str(path)


class TestMOTChallenge:
    def test_perfect_tracking_mota(self, tmp_path):
        ann = _mot_json(tmp_path)
        ds = MOTChallengeDataset(ann_file=ann, test_mode=True)
        assert len(ds) == 4
        # feed ground truth back as predictions -> perfect MOTA
        results = []
        for info in ds.data_infos:
            a = ds.get_ann_info(info)
            anns = ds.coco.img_to_anns[info["id"]]
            ids = np.asarray([x["instance_id"] for x in anns])
            tb = np.concatenate(
                [ids[:, None].astype(np.float32), a["bboxes"],
                 np.ones((len(ids), 1), np.float32)], axis=1)
            results.append(dict(track_bboxes=tb))
        m = ds.evaluate(results)
        assert m["MOTA"] == pytest.approx(1.0)
        assert m["IDSw"] == 0

    def test_idsw_detected(self, tmp_path):
        ann = _mot_json(tmp_path)
        ds = MOTChallengeDataset(ann_file=ann, test_mode=True)
        results = []
        for k, info in enumerate(ds.data_infos):
            a = ds.get_ann_info(info)
            anns = ds.coco.img_to_anns[info["id"]]
            ids = np.asarray([x["instance_id"] for x in anns])
            if k >= 2:  # swap identities mid-video
                ids = ids[::-1].copy()
            tb = np.concatenate(
                [ids[:, None].astype(np.float32), a["bboxes"],
                 np.ones((len(ids), 1), np.float32)], axis=1)
            results.append(dict(track_bboxes=tb))
        m = ds.evaluate(results)
        assert m["IDSw"] >= 2

    def test_format_results(self, tmp_path):
        ann = _mot_json(tmp_path)
        ds = MOTChallengeDataset(ann_file=ann, test_mode=True)
        results = [dict(track_bboxes=np.asarray(
            [[1, 10.0, 20.0, 50.0, 100.0, 0.9]]))] * len(ds)
        paths = ds.format_results(results, str(tmp_path / "out"))
        assert len(paths) == 1 and paths[0].endswith("MOT17-02.txt")
        lines = open(paths[0]).read().strip().split("\n")
        assert len(lines) == 4
        f, tid, x, y, w, h, conf, *_ = lines[0].split(",")
        assert (int(f), int(tid)) == (1, 1)
        assert float(w) == pytest.approx(40.0)


def _sot_json(tmp_path, n_videos=2, n_frames=5):
    videos, images, anns = [], [], []
    img_id = ann_id = 0
    for vid in range(1, n_videos + 1):
        videos.append(dict(id=vid, name=f"seq-{vid}"))
        for fid in range(n_frames):
            img_id += 1
            images.append(dict(id=img_id, video_id=vid, frame_id=fid,
                               file_name=f"seq-{vid}/img/{fid + 1:08d}.jpg"))
            ann_id += 1
            anns.append(dict(id=ann_id, image_id=img_id, category_id=1,
                             bbox=[10 + fid, 20 + fid, 30, 40], area=1200,
                             iscrowd=0, instance_id=1))
    data = dict(videos=videos, images=images, annotations=anns,
                categories=[dict(id=1, name="object")])
    path = tmp_path / "sot.json"
    path.write_text(json.dumps(data))
    return str(path)


class TestLaSOT:
    def test_get_video_and_perfect_ope(self, tmp_path):
        ds = LaSOTDataset(ann_file=_sot_json(tmp_path), test_mode=True)
        assert ds.num_videos == 2
        v = ds.get_video(0)
        assert v["gt_bboxes"].shape == (5, 4)
        # feed gt back: perfect OPE
        results = [ds.get_video(i)["gt_bboxes"] for i in range(2)]
        m = ds.evaluate(results)
        assert m["success"] > 95.0
        assert m["precision"] == pytest.approx(100.0)


class TestSOTTrain:
    def test_positive_pair_same_video(self, tmp_path):
        ds = SOTTrainDataset(ann_file=_sot_json(tmp_path),
                             neg_pair_ratio=0.0)
        rng = random.Random(0)
        t, s, pos = ds.sample_pair(0, rng)
        assert pos
        assert t["img_info"]["video_id"] == s["img_info"]["video_id"]
        assert t["ann"]["bboxes"].shape == (1, 4)

    def test_negative_pairs_occur(self, tmp_path):
        ds = SOTTrainDataset(ann_file=_sot_json(tmp_path),
                             neg_pair_ratio=1.0)
        rng = random.Random(0)
        negs = sum(
            0 if ds.sample_pair(0, rng)[2] else 1 for _ in range(20)
        )
        assert negs > 0
