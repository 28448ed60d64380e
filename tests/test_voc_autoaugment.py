"""VOCDataset (XML parsing + VOC2007 11-point mAP) and AutoAugment
pipeline transforms."""

import json
import os

import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401
from lowlightenvironmentvideoobjectdetection_tpu.registry import DATASETS, PIPELINES

VOC_XML = """<annotation>
  <size><width>64</width><height>48</height><depth>3</depth></size>
  <object>
    <name>dog</name><difficult>0</difficult>
    <bndbox><xmin>9</xmin><ymin>9</ymin><xmax>33</xmax><ymax>29</ymax></bndbox>
  </object>
  <object>
    <name>person</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>"""


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vocdata") / "VOC2007"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets").mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(root / "JPEGImages" / f"00000{i}.jpg"),
                    rng.randint(0, 255, (48, 64, 3)).astype(np.uint8))
        (root / "Annotations" / f"00000{i}.xml").write_text(VOC_XML)
    (root / "ImageSets" / "main.txt").write_text("000000\n000001\n")
    return str(root)


class TestVOC:
    def test_parse_and_classes(self, voc_root):
        ds = DATASETS.get("VOCDataset")(
            ann_file=os.path.join(voc_root, "ImageSets", "main.txt"),
            img_prefix=voc_root)
        assert ds.year == 2007
        assert len(ds) == 2
        s = ds[0]
        ann = s["ann"]
        # difficult object goes to the ignore set (xml_style.py semantics)
        assert ann["bboxes"].shape == (1, 4)
        assert ann["bboxes_ignore"].shape == (1, 4)
        assert ds.CLASSES[int(ann["labels"][0])] == "dog"
        # VOC 1-indexed -> 0-indexed
        np.testing.assert_allclose(ann["bboxes"][0], [8, 8, 32, 28])

    def test_voc2007_eval_11points(self, voc_root):
        ds = DATASETS.get("VOCDataset")(
            ann_file=os.path.join(voc_root, "ImageSets", "main.txt"),
            img_prefix=voc_root)
        n_cls = len(ds.CLASSES)
        dets = []
        for i in range(2):
            per_cls = [np.zeros((0, 5), np.float32) for _ in range(n_cls)]
            # perfect dog detection
            per_cls[ds.CLASSES.index("dog")] = np.asarray(
                [[8, 8, 32, 28, 0.9]], np.float32)
            dets.append(per_cls)
        out = ds.evaluate(dets)
        assert out["mAP"] > 0.99  # only class with gts is perfectly found


class TestAutoAugment:
    def _results(self):
        rng = np.random.RandomState(0)
        return dict(
            img=rng.randint(0, 255, (48, 64, 3)).astype(np.float32),
            gt_bboxes=np.asarray([[10.0, 10.0, 30.0, 26.0]], np.float32),
            bbox_fields=["gt_bboxes"],
        )

    def test_translate_moves_boxes(self):
        t = PIPELINES.get("Translate")(level=4.0, prob=1.0,
                                       max_translate_offset=10.0,
                                       random_negative_prob=0.0)
        r = t(self._results())
        np.testing.assert_allclose(r["gt_bboxes"][0],
                                   [14.0, 10.0, 34.0, 26.0])

    def test_rotate_keeps_box_inside(self):
        t = PIPELINES.get("Rotate")(level=5.0, prob=1.0)
        r = t(self._results())
        b = r["gt_bboxes"][0]
        assert b[0] >= 0 and b[1] >= 0 and b[2] <= 64 and b[3] <= 48
        assert (b[2] - b[0]) > 0 and (b[3] - b[1]) > 0

    def test_autoaugment_policy_container(self):
        aug = PIPELINES.get("AutoAugment")(policies=[
            [dict(type="Shear", level=3.0, prob=1.0)],
            [dict(type="BrightnessTransform", level=3.0, prob=1.0)],
        ])
        r = aug(self._results())
        assert r["img"].shape == (48, 64, 3)

    def test_color_ops_run(self):
        for name in ("ColorTransform", "EqualizeTransform",
                     "BrightnessTransform", "ContrastTransform"):
            t = PIPELINES.get(name)(prob=1.0)
            r = t(self._results())
            assert r["img"].shape == (48, 64, 3)

    def test_instaboost_gated(self):
        with pytest.raises(ImportError):
            PIPELINES.get("InstaBoost")()


class TestExtraDatasets:
    def test_lvis_reads_coco_shaped_json(self, tmp_path):
        import json as _json

        ann = dict(
            images=[dict(id=1, file_name="a.jpg", width=8, height=8)],
            annotations=[dict(id=1, image_id=1, category_id=7,
                              bbox=[1, 1, 4, 4], area=16, iscrowd=0)],
            categories=[dict(id=7, name="zebra"), dict(id=3, name="ant")],
        )
        p = tmp_path / "lvis.json"
        p.write_text(_json.dumps(ann))
        ds = DATASETS.get("LVISV1Dataset")(ann_file=str(p))
        assert ds.CLASSES == ("ant", "zebra")
        s = ds[0]
        assert ds.CLASSES[int(s["ann"]["labels"][0])] == "zebra"

    def test_registered_classes(self):
        assert DATASETS.get("CityscapesDataset").CLASSES[0] == "person"
        assert DATASETS.get("WIDERFaceDataset").CLASSES == ("face",)
        assert len(DATASETS.get("DeepFashionDataset").CLASSES) == 15


class TestCorruptions:
    def test_all_corruptions_run_and_change_image(self):
        from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines.corruptions import (
            CORRUPTIONS,
        )

        rng = np.random.RandomState(0)
        base = rng.randint(30, 220, (32, 40, 3)).astype(np.float32)
        for name in CORRUPTIONS:
            t = PIPELINES.get("Corrupt")(corruption=name, severity=3)
            r = t(dict(img=base.copy()))
            assert r["img"].shape == base.shape, name
            assert np.isfinite(r["img"]).all(), name
            assert not np.allclose(r["img"], base), name
            assert r["img"].min() >= 0 and r["img"].max() <= 255

    def test_severity_monotone_for_gaussian(self):
        rng = np.random.RandomState(1)
        base = rng.randint(60, 200, (32, 40, 3)).astype(np.float32)
        np.random.seed(0)
        d1 = np.abs(PIPELINES.get("Corrupt")("gaussian_noise", 1)(
            dict(img=base.copy()))["img"] - base).mean()
        np.random.seed(0)
        d5 = np.abs(PIPELINES.get("Corrupt")("gaussian_noise", 5)(
            dict(img=base.copy()))["img"] - base).mean()
        assert d5 > d1

    def test_unknown_corruption_raises(self):
        with pytest.raises(KeyError):
            PIPELINES.get("Corrupt")(corruption="nope")
