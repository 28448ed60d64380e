"""Tests for the configs tree and the CLI tools layer."""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfigs:
    def test_all_configs_load_and_types_registered(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
        from lowlightenvironmentvideoobjectdetection_tpu.config import Config
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS

        paths = [p for p in glob.glob(os.path.join(REPO, "configs/**/*.py"),
                                      recursive=True)
                 if "_base_" not in p]
        assert len(paths) >= 12
        for p in paths:
            cfg = Config.fromfile(p)
            assert "model" in cfg, p
            assert cfg.model["type"] in MODELS, (p, cfg.model["type"])

    def test_base_inheritance_and_delete(self):
        from lowlightenvironmentvideoobjectdetection_tpu.config import Config

        cfg = Config.fromfile(os.path.join(
            REPO, "configs/vid/llvod/llvod_l4_darkfarm.py"))
        # child overrides type + out_indices; base contributes depth etc.
        assert cfg.model["type"] == "SelsaDarkfarmDetect"
        assert tuple(cfg.model["out_indices"]) == (3, 3)
        assert cfg.model["depth"] == 50  # from _base_ faster_rcnn_r50_dc5
        assert cfg.optimizer["lr"] == 0.01  # from default_runtime

    def test_delete_replaces_model(self):
        from lowlightenvironmentvideoobjectdetection_tpu.config import Config

        cfg = Config.fromfile(os.path.join(
            REPO, "configs/vid/llvod/llvod_fastdvd_darkfarm.py"))
        assert cfg.model["type"] == "SelsaFastDVDnetDetect"
        # _delete_=True dropped the base's keys
        assert "loss_type" not in cfg.model


class TestConverters:
    def test_darkfarm_converter(self, tmp_path):
        """Reference-semantics converter (list-driven, xml under GT/) feeds
        DarkFarmVIDDataset round-trip. Byte-fidelity vs the reference's own
        converter code is covered by tests/test_converter_fidelity.py."""
        root = tmp_path / "dfroot"
        lists = root / "Lists"
        lists.mkdir(parents=True)
        vid = "day1/camA/sceneA/noisy"
        (lists / "darkfarm_vid_x_val.txt").write_text(f"{vid} 0 3\n")
        gt = root / "day1/camA/sceneA/GT"
        gt.mkdir(parents=True)
        for i in range(3):
            (gt / f"{i}.xml").write_text(
                "<annotation><size><width>640</width>"
                "<height>480</height></size>"
                "<object><name>sheep</name><trackid>0</trackid>"
                "<occluded>0</occluded><generated>0</generated>"
                "<bndbox><xmin>10</xmin><ymin>20</ymin>"
                "<xmax>50</xmax><ymax>60</ymax></bndbox></object>"
                "</annotation>")
        sys.path.insert(0, os.path.join(REPO, "tools", "convert_datasets"))
        try:
            import darkfarm2coco_vid as D
        finally:
            sys.path.pop(0)
        D.convert_darkfarm(D.base_json(), str(root), str(tmp_path), "val",
                           "darkfarm_vid_x_val")
        out = tmp_path / "darkfarm_vid_x_val.json"
        data = json.load(open(out))
        assert len(data["videos"]) == 1
        assert len(data["images"]) == 3
        assert len(data["annotations"]) == 3
        ann = data["annotations"][0]
        assert ann["category_id"] == 3  # sheep
        assert data["images"][0]["file_name"] == f"{vid}/0.JPG"
        assert not data["images"][0]["is_vid_train_frame"]

        # round-trip through the dataset class
        from lowlightenvironmentvideoobjectdetection_tpu.data.datasets import (
            DarkFarmVIDDataset,
        )

        ds = DarkFarmVIDDataset(ann_file=str(out), img_prefix=str(root),
                                test_mode=True)
        assert len(ds) == 3
        s = ds[1]
        assert s["ann"]["bboxes"].shape == (1, 4)

    def test_mot_converter(self, tmp_path):
        seq = tmp_path / "train" / "MOT17-02"
        (seq / "gt").mkdir(parents=True)
        (seq / "seqinfo.ini").write_text(
            "[Sequence]\nseqLength=2\nimWidth=640\nimHeight=480\nframeRate=30\n"
        )
        (seq / "gt" / "gt.txt").write_text(
            "1,5,10,20,30,40,1,1,1.0\n2,5,12,22,30,40,1,1,1.0\n"
        )
        out = tmp_path / "mot.json"
        sys.path.insert(0, os.path.join(REPO, "tools", "convert_datasets"))
        try:
            import mot2coco as M
        finally:
            sys.path.pop(0)
        M.convert(str(tmp_path), str(out))
        data = json.load(open(out))
        assert len(data["images"]) == 2
        assert len(data["annotations"]) == 2
        assert data["annotations"][0]["instance_id"] == 5



class TestCLISmoke:
    def test_print_config(self):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/print_config.py"),
             os.path.join(REPO, "configs/det/retinanet_r50_fpn_1x_coco.py")],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0
        cfg = json.loads(r.stdout)
        assert cfg["model"]["type"] == "RetinaNet"

    def test_analyze_logs(self, tmp_path):
        log = tmp_path / "log.json"
        log.write_text('{"wall_s": 10.0, "steps": 5, "loss": 1.0}\n')
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/analyze_logs.py"),
             "cal_train_time", str(log)],
            capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 0
        assert "mean iter time" in r.stdout


class TestSlidingWindow:
    def test_tile_grid_covers(self):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        try:
            from sliding_window_inference import tile_grid
        finally:
            sys.path.pop(0)
        tiles = tile_grid(300, 500, win=128, overlap=0.25)
        # full coverage: every pixel inside some window
        cov = set()
        for (y, x) in tiles:
            assert 0 <= y <= 300 - 128 and 0 <= x <= 500 - 128
        ys = sorted({y for y, _ in tiles})
        xs = sorted({x for _, x in tiles})
        assert ys[0] == 0 and ys[-1] == 300 - 128
        assert xs[0] == 0 and xs[-1] == 500 - 128
        # neighbor stride <= win (overlap)
        for a, b in zip(ys, ys[1:]):
            assert b - a <= 128
        for a, b in zip(xs, xs[1:]):
            assert b - a <= 128

    def test_tile_grid_small_image(self):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        try:
            from sliding_window_inference import tile_grid
        finally:
            sys.path.pop(0)
        assert tile_grid(50, 60, win=128, overlap=0.25) == [(0, 0)]
