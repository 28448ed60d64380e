"""Tests for the mAP evaluators and the COCO-VID data layer (host-side)."""

import json

import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
    eval_coco_ap,
    eval_map,
)
from lowlightenvironmentvideoobjectdetection_tpu.data.coco_vid import CocoVID
from lowlightenvironmentvideoobjectdetection_tpu.data.datasets import (
    CocoVideoDataset,
    distributed_video_split,
)


class TestEvalMap:
    def test_perfect_detection(self):
        ann = dict(
            bboxes=np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
            labels=np.array([0, 1]),
        )
        dets = [
            np.array([[0, 0, 10, 10, 0.9]], np.float32),
            np.array([[20, 20, 40, 40, 0.8]], np.float32),
        ]
        mAP, per_cls = eval_map([dets], [ann])
        assert mAP == pytest.approx(1.0)

    def test_false_positive_lowers_precision(self):
        ann = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32), labels=np.array([0]))
        dets = [
            np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.95]], np.float32),
        ]
        mAP, _ = eval_map([dets], [ann])
        # fp at higher score: precision at recall 1.0 is 0.5
        assert 0.4 < mAP < 0.6

    def test_missed_gt(self):
        ann = dict(
            bboxes=np.array([[0, 0, 10, 10], [30, 30, 40, 40]], np.float32),
            labels=np.array([0, 0]),
        )
        dets = [np.array([[0, 0, 10, 10, 0.9]], np.float32)]
        mAP, _ = eval_map([dets], [ann])
        assert mAP == pytest.approx(0.5, abs=0.01)

    def test_coco_ap(self):
        ann = dict(bboxes=np.array([[0, 0, 100, 100]], np.float32), labels=np.array([0]))
        dets = [np.array([[2, 2, 100, 100, 0.9]], np.float32)]  # IoU ~0.96
        res = eval_coco_ap([dets], [ann])
        assert res["AP50"] == pytest.approx(1.0, abs=0.01)
        assert 0.5 < res["mAP"] <= 1.0


def make_cocovid_fixture(tmp_path, num_videos=2, frames=6):
    images, anns, videos = [], [], []
    img_id, ann_id = 0, 0
    for v in range(num_videos):
        videos.append(dict(id=v, name=f"vid{v}"))
        for f in range(frames):
            images.append(
                dict(id=img_id, video_id=v, frame_id=f, file_name=f"v{v}/{f}.jpg",
                     width=64, height=64)
            )
            anns.append(
                dict(id=ann_id, image_id=img_id, category_id=1,
                     bbox=[4, 4, 20, 20], area=400, iscrowd=0, instance_id=v)
            )
            img_id += 1
            ann_id += 1
    data = dict(
        videos=videos, images=images, annotations=anns,
        categories=[dict(id=1, name="person"), dict(id=2, name="cow")],
    )
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(data))
    return str(p)


class TestCocoVID:
    def test_parser(self, tmp_path):
        path = make_cocovid_fixture(tmp_path)
        coco = CocoVID(path)
        assert coco.get_vid_ids() == [0, 1]
        ids = coco.get_img_ids_from_vid(0)
        assert len(ids) == 6
        frames = [coco.imgs[i]["frame_id"] for i in ids]
        assert frames == sorted(frames)

    def test_dataset_uniform_sampling(self, tmp_path):
        path = make_cocovid_fixture(tmp_path)
        ds = CocoVideoDataset(
            path, classes=("person", "cow"),
            ref_img_sampler=dict(frame_range=2, num_ref_imgs=2, method="uniform"),
        )
        s = ds[3]
        assert len(s["ref_img_infos"]) == 2
        for r in s["ref_img_infos"]:
            assert r["video_id"] == s["img_info"]["video_id"]
            assert r["id"] != s["img_info"]["id"]
        assert s["ann"]["bboxes"].shape == (1, 4)

    def test_bilateral_sampling(self, tmp_path):
        path = make_cocovid_fixture(tmp_path)
        ds = CocoVideoDataset(
            path, classes=("person", "cow"),
            ref_img_sampler=dict(
                frame_range=[-3, 3], num_ref_imgs=2, method="bilateral_uniform"
            ),
        )
        s = ds[2]
        fids = [r["frame_id"] for r in s["ref_img_infos"]]
        key = s["img_info"]["frame_id"]
        assert len(fids) == 2
        assert any(f <= key for f in fids) and any(f >= key for f in fids)

    def test_adaptive_stride(self, tmp_path):
        path = make_cocovid_fixture(tmp_path, num_videos=1, frames=10)
        ds = CocoVideoDataset(
            path, classes=("person", "cow"), test_mode=True,
            ref_img_sampler=dict(
                frame_range=[-2, 2], num_ref_imgs=4,
                method="test_with_adaptive_stride",
            ),
        )
        s0 = ds[0]
        fids = [r["frame_id"] for r in s0["ref_img_infos"]]
        assert fids == [0, 3, 6, 9]
        s1 = ds[1]
        assert s1["ref_img_infos"] == []

    def test_fix_stride(self, tmp_path):
        path = make_cocovid_fixture(tmp_path, num_videos=1, frames=20)
        ds = CocoVideoDataset(
            path, classes=("person", "cow"), test_mode=True,
            ref_img_sampler=dict(
                frame_range=[-2, 2], num_ref_imgs=4, stride=2,
                method="test_with_fix_stride",
            ),
        )
        s0 = ds[0]
        assert len(s0["ref_img_infos"]) == 5  # 3 left-padding + 2 strided
        assert s0["img_info"]["num_left_ref_imgs"] == 2
        s2 = ds[2]  # frame 2 % stride 2 == 0 -> one new ref
        assert len(s2["ref_img_infos"]) == 1

    def test_video_split(self, tmp_path):
        path = make_cocovid_fixture(tmp_path, num_videos=4, frames=5)
        ds = CocoVideoDataset(path, classes=("person", "cow"), test_mode=True)
        splits = distributed_video_split(ds.data_infos, 2)
        assert sum(len(s) for s in splits) == 20
        # each shard starts at a frame_id==0 boundary
        for s in splits:
            assert ds.data_infos[s[0]]["frame_id"] == 0


class TestPrefetch:
    def test_order_and_completion(self):
        from lowlightenvironmentvideoobjectdetection_tpu.data.prefetch import (
            prefetch,
        )

        out = list(prefetch(iter(range(20)), buffer_size=4))
        assert out == list(range(20))

    def test_overlap(self):
        import time

        from lowlightenvironmentvideoobjectdetection_tpu.data.prefetch import (
            prefetch,
        )

        def slow_src():
            for i in range(5):
                time.sleep(0.05)
                yield i

        it = prefetch(slow_src(), buffer_size=4)
        time.sleep(0.15)  # let the worker pre-produce
        t0 = time.perf_counter()
        first_three = [next(it), next(it), next(it)]
        dt = time.perf_counter() - t0
        assert first_three == [0, 1, 2]
        assert dt < 0.05  # already buffered -> near-instant

    def test_error_propagates(self):
        import pytest as _pytest

        from lowlightenvironmentvideoobjectdetection_tpu.data.prefetch import (
            prefetch,
        )

        def bad():
            yield 1
            raise ValueError("boom")

        it = prefetch(bad())
        assert next(it) == 1
        with _pytest.raises(ValueError):
            for _ in it:
                pass
