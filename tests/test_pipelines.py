"""Tests for the config-driven data pipeline (transforms + formatting)."""

import os

import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines import (
    Compose,
    transforms as T,
)
from lowlightenvironmentvideoobjectdetection_tpu.registry import PIPELINES


def _results(h=64, w=80, c=3, seed=0, with_ann=True):
    rng = np.random.RandomState(seed)
    r = dict(
        img=rng.randint(0, 255, (h, w, c), dtype=np.uint8),
        img_shape=(h, w),
        ori_shape=(h, w),
        img_fields=["img"],
    )
    if with_ann:
        r["gt_bboxes"] = np.asarray([[10.0, 10.0, 40.0, 30.0]], np.float32)
        r["gt_labels"] = np.asarray([1], np.int64)
        r["gt_instance_ids"] = np.asarray([7], np.int64)
        r["bbox_fields"] = ["gt_bboxes"]
    return r


class TestGeometric:
    def test_resize_scales_boxes(self):
        r = T.Resize(img_scale=(160, 128))(_results())
        assert r["img"].shape[:2] == r["img_shape"]
        sf = r["scale_factor"]
        np.testing.assert_allclose(
            r["gt_bboxes"][0], np.asarray([10, 10, 40, 30]) * sf, rtol=1e-5
        )

    def test_seq_flip_shared(self):
        rs = [_results(seed=i) for i in range(3)]
        out = T.SeqRandomFlip(share_params=True, flip_ratio=1.0)(rs)
        assert all(o["flip"] for o in out)
        # flipped box: x1' = w - x2
        w = out[0]["img_shape"][1]
        assert out[0]["gt_bboxes"][0, 0] == w - 40.0

    def test_pad_divisor(self):
        r = T.Pad(size_divisor=32)(_results(h=65, w=70))
        assert r["img"].shape[:2] == (96, 96)
        assert r["pad_shape"] == (96, 96)

    def test_random_crop_drops_outside_gts(self):
        r = _results(h=64, w=80)
        r["gt_bboxes"] = np.asarray(
            [[2.0, 2.0, 10.0, 10.0], [60.0, 50.0, 75.0, 60.0]], np.float32
        )
        r["gt_labels"] = np.asarray([0, 1], np.int64)
        r["gt_instance_ids"] = np.asarray([1, 2], np.int64)
        out = T.RandomCrop((32, 32)).apply(dict(r), 0, 0)
        assert len(out["gt_bboxes"]) == 1
        assert out["gt_labels"].tolist() == [0]


class TestLowLight:
    def test_brighten_reaches_target_mean(self):
        r = _results()
        r["img"] = (r["img"] * 0.1).astype(np.uint8)  # dark
        out = T.Brighten(m=0.4)(r)
        got = out["img"].astype(np.float32).mean() / 255.0
        assert 0.25 < got < 0.55  # clipped amp lands near m
        assert "brighten_level" in out

    def test_seq_brighten_shares_amp(self):
        rs = [_results(seed=0), _results(seed=1)]
        for r in rs:
            r["img"] = (r["img"] * 0.2).astype(np.uint8)
        out = T.SeqBrighten(m=0.4, share_params=True)(rs)
        assert out[0]["brighten_level"] == out[1]["brighten_level"]

    def test_brighten_pair_only_amplifies_noisy_half(self):
        r = _results(c=6)
        r["img"] = (r["img"] * 0.2).astype(np.uint8)
        clean_before = r["img"][..., 3:].copy()
        out = T.Brighten(m=0.5)(r)
        np.testing.assert_array_equal(out["img"][..., 3:], clean_before)

    def test_normalize_pairs(self):
        r = _results(c=6)
        out = T.NormalizePairs()(r)
        assert out["img"].dtype == np.float32
        assert out["img"].shape[-1] == 6

    def test_normalize_raw_8ch(self):
        r = _results(c=8)
        out = T.NormalizeRAW(mean=[0.25] * 4, std=[0.1] * 4)(r)
        assert out["img"].shape[-1] == 8

    def test_add_noise_makes_pair(self):
        r = _results(c=3)
        out = T.AddNoise(noise_type="gauss", am=0.8, seed=0)(r)
        assert out["img"].shape[-1] == 6
        noisy, clean = out["img"][..., :3], out["img"][..., 3:]
        assert not np.allclose(noisy, clean)

    def test_srgb2raw_mosaic(self):
        r = _results(h=64, w=64, c=3)
        out = T.SRGB2RAW(seed=0)(r)
        # full-resolution (R,G,G,B) plane stack (reference _demosaicing)
        assert out["img"].shape == (64, 64, 4)

    def test_seq_add_noise_share(self):
        rs = [_results(seed=0), _results(seed=0)]
        out = T.SeqAddNoise(noise_type="gauss", share_params=True)(rs)
        # identical clean inputs + shared seed -> identical noise
        np.testing.assert_array_equal(out[0]["img"], out[1]["img"])


class TestSOTAugs:
    def test_crop_like_siamfc(self):
        rs = [_results(h=128, w=128)]
        out = T.SeqCropLikeSiamFC(context_amount=0.5, exemplar_size=127,
                                  crop_size=255)(rs)
        assert out[0]["img"].shape[:2] == (255, 255)
        assert out[0]["gt_bboxes"].shape == (1, 4)

    def test_shift_scale_color_blur(self):
        rs = [_results(h=300, w=300, seed=0), _results(h=300, w=300, seed=1)]
        out = T.SeqShiftScaleAug(target_size=(127, 255))(rs)
        assert out[0]["img"].shape[:2] == (127, 127)
        assert out[1]["img"].shape[:2] == (255, 255)
        out = T.SeqColorAug(prob=(1.0, 1.0))(out)
        out = T.SeqBlurAug(prob=(1.0, 1.0))(out)
        assert out[0]["img"].shape[:2] == (127, 127)


class TestFormatting:
    def test_concat_refs_and_bundle(self):
        key = _results(seed=0)
        refs = [_results(seed=1), _results(seed=2)]
        cat = PIPELINES.get("ConcatVideoReferences")()([key] + refs)
        assert len(cat) == 2
        assert cat[1]["img"].shape == (2, 64, 80, 3)
        # frame-index column prepended
        assert cat[1]["gt_bboxes"].shape == (2, 5)
        assert cat[1]["gt_bboxes"][0, 0] == 0 and cat[1]["gt_bboxes"][1, 0] == 1

        flat = PIPELINES.get("SeqDefaultFormatBundle")()(cat)
        assert "ref_img" in flat and flat["ref_img"].dtype == np.float32
        assert flat["img"].dtype == np.float32

    def test_video_collect_meta(self):
        r = _results()
        r["frame_id"] = 3
        r["img_info"] = {"video_id": 9}
        out = PIPELINES.get("VideoCollect")(keys=["img", "gt_bboxes"])(r)
        assert out["img_metas"]["frame_id"] == 3
        assert out["img_metas"]["video_id"] == 9
        assert "img" in out and "gt_bboxes" in out

    def test_match_instances(self):
        key = _results(seed=0)
        key["gt_instance_ids"] = np.asarray([5, 7, 9], np.int64)
        key["gt_bboxes"] = np.zeros((3, 4), np.float32)
        ref = _results(seed=1)
        ref["gt_instance_ids"] = np.asarray([9, 5], np.int64)
        ref["gt_bboxes"] = np.zeros((2, 4), np.float32)
        out = PIPELINES.get("MatchInstances")()([key, ref])
        assert out[0]["gt_match_indices"].tolist() == [1, -1, 0]
        assert out[1]["gt_match_indices"].tolist() == [2, 0]


class TestLoadingAndCompose:
    def test_pair_loading_path_surgery(self, tmp_path):
        import cv2

        seq = tmp_path / "video1" / "noisy"
        gt = tmp_path / "video1" / "GT"
        seq.mkdir(parents=True)
        gt.mkdir()
        noisy = np.full((32, 32, 3), 40, np.uint8)
        clean = np.full((32, 32, 3), 200, np.uint8)
        cv2.imwrite(str(seq / "000001.jpg"), noisy)
        cv2.imwrite(str(gt / "000001.jpg"), clean)

        pipe = Compose([
            dict(type="LoadImagePairsFromFile"),
            dict(type="SeqLoadAnnotations"),
            dict(type="Resize", img_scale=(32, 32)),
            dict(type="NormalizePairs"),
            dict(type="Pad", size_divisor=16),
        ])
        r = pipe(dict(
            img_info={"filename": "video1/noisy/000001.jpg"},
            img_prefix=str(tmp_path),
            ann={"bboxes": [[2, 2, 20, 20]], "labels": [0],
                 "instance_ids": [1]},
        ))
        assert r["img"].shape[-1] == 6
        # noisy half is darker than clean half after normalize
        assert r["img"][..., :3].mean() < r["img"][..., 3:].mean()

    def test_compose_from_registry_names(self):
        pipe = Compose([
            dict(type="Resize", img_scale=(96, 96)),
            dict(type="RandomFlip", flip_ratio=0.0),
            dict(type="Normalize"),
            dict(type="Pad", size_divisor=32),
            dict(type="DefaultFormatBundle"),
        ])
        out = pipe(_results())
        assert out["img"].dtype == np.float32
        assert out["img"].shape[0] % 32 == 0
