"""tools/coco_error_analysis.py (reference mmdetection/tools/
coco_error_analysis.py analog): error-type decomposition on controlled
synthetic detections."""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "cea", os.path.join(REPO, "tools", "coco_error_analysis.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scene(loc_jitter=0.0, wrong_class=False):
    """4 images, 2 classes; detections = gts with controlled defects."""
    dets, anns = [], []
    for i in range(4):
        boxes = np.asarray([[10, 10, 60, 60], [100, 100, 180, 180]],
                           np.float32)
        labels = np.asarray([0, 1])
        anns.append(dict(bboxes=boxes, labels=labels))
        per_cls = [np.zeros((0, 5), np.float32) for _ in range(2)]
        for b, l in zip(boxes, labels):
            d = b + loc_jitter * np.asarray([8, 8, -8, -8], np.float32)
            row = np.concatenate([d, [0.9]]).astype(np.float32)[None]
            c = (1 - l) if wrong_class else l
            per_cls[c] = np.concatenate([per_cls[c], row])
        dets.append(per_cls)
    return dets, anns


class TestErrorAnalysis:
    def test_perfect_dets_no_errors(self):
        M = _mod()
        dets, anns = _scene()
        r = M.analyze(dets, anns, num_classes=2)
        s = r["summary"]
        assert s["mAP"] == 1.0
        assert s["err_localization"] == 0.0
        assert s["err_confusion"] == 0.0
        assert s["err_background_and_missed"] == 0.0

    def test_localization_error_detected(self):
        """Boxes shifted enough to fail IoU 0.5 but pass IoU 0.1 show up as
        localization error, not confusion."""
        M = _mod()
        dets, anns = _scene(loc_jitter=2.2)
        r = M.analyze(dets, anns, num_classes=2)
        s = r["summary"]
        assert s["mAP"] < 0.5
        assert s["err_localization"] > 0.4
        assert s["err_confusion"] < 0.1

    def test_confusion_error_detected(self):
        """Right boxes, wrong class: zero strict AP, fully recovered by the
        class-agnostic pass -> confusion bucket."""
        M = _mod()
        dets, anns = _scene(wrong_class=True)
        r = M.analyze(dets, anns, num_classes=2)
        s = r["summary"]
        assert s["mAP"] == 0.0
        assert s["err_confusion"] > 0.9
        assert s["err_background_and_missed"] < 0.1

    def test_per_class_rows_and_area_buckets(self):
        M = _mod()
        dets, anns = _scene()
        r = M.analyze(dets, anns, num_classes=2)
        assert len(r["per_class"]) == 2
        assert r["per_class"][0]["num_gts"] == 4
        # 50px box is 'medium', 80px box is 'medium' too at these sizes
        assert r["summary"]["area_ap"]["medium"] == 1.0


class TestLaunchers:
    def test_slurm_scripts_exist_and_executable(self):
        for name in ("slurm_train.sh", "slurm_test.sh", "dist_train.sh",
                     "dist_test.sh"):
            p = os.path.join(REPO, "tools", name)
            assert os.path.exists(p), name
            assert os.access(p, os.X_OK), name
