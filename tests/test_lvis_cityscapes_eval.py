"""Native LVIS federated eval + Cityscapes instance-mask eval (VERDICT r2
weak #7: the datasets existed as parsers; these are the reference-specific
*benchmarks* — LVIS per-frequency-band AP (mmdet lvis.py:309 via the lvis
pkg) and cityscapes instance mAP/AP@50 (cityscapes.py:274 via
cityscapesscripts) — re-derived natively."""

import json

import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core.eval.instseg import (
    ann_to_mask,
    eval_mask_ap,
    mask_iou_matrix,
    polygon_to_mask,
    rle_to_mask,
)
from lowlightenvironmentvideoobjectdetection_tpu.core.eval.lvis_eval import (
    eval_lvis,
    frequency_bands,
)


def det(*rows):
    return np.asarray(rows, np.float32).reshape(-1, 5)


class TestLVISEval:
    def _perfect(self, ann):
        """Detections exactly on every gt."""
        out = [np.zeros((0, 5), np.float32), np.zeros((0, 5), np.float32)]
        for b, l in zip(ann["bboxes"], ann["labels"]):
            r = np.concatenate([b, [0.9]]).astype(np.float32)
            out[l] = np.concatenate([out[l], r[None]])
        return out

    def test_perfect_detections_ap1(self):
        ann = dict(bboxes=np.array([[0, 0, 10, 10], [20, 20, 40, 40]],
                                   np.float32),
                   labels=np.array([0, 1]))
        res = eval_lvis([self._perfect(ann)], [ann], class_bands=("r", "f"))
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        assert res["APr"] == pytest.approx(1.0, abs=1e-6)
        assert res["APf"] == pytest.approx(1.0, abs=1e-6)
        assert np.isnan(res["APc"])  # no common-band class present

    def test_federated_ignores_uninformative_images(self):
        """A false positive for class c on an image with no gt-for-c and no
        neg listing must NOT count against c; the same detection on an image
        where c is verified-absent MUST."""
        gt_img = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                      labels=np.array([0]))
        blank_unknown = dict(bboxes=np.zeros((0, 4), np.float32),
                             labels=np.zeros((0,), np.int64))
        blank_neg = dict(bboxes=np.zeros((0, 4), np.float32),
                         labels=np.zeros((0,), np.int64),
                         neg_labels=(0,))
        hit = [det([0, 0, 10, 10, 0.9])]
        fp = [det([50, 50, 60, 60, 0.95])]  # outscores the hit

        base = eval_lvis([hit, fp], [gt_img, blank_unknown],
                         class_bands=("f",))
        assert base["AP"] == pytest.approx(1.0, abs=1e-6)

        punished = eval_lvis([hit, fp], [gt_img, blank_neg],
                             class_bands=("f",))
        assert punished["AP"] < 0.6  # the FP now precedes the TP

    def test_not_exhaustive_image_excluded(self):
        """gt images flagged not-exhaustive for c contribute neither their
        gts nor their detections to c's score."""
        g1 = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                  labels=np.array([0]))
        g2 = dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                  labels=np.array([0]), not_exhaustive_labels=(0,))
        miss = [np.zeros((0, 5), np.float32)]
        res = eval_lvis([[det([0, 0, 10, 10, 0.9])], miss], [g1, g2],
                        class_bands=("f",))
        # the missed gt on the excluded image does not reduce recall
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)

    def test_frequency_bands_from_image_count(self):
        cats = [dict(id=1, image_count=5), dict(id=2, image_count=50),
                dict(id=3, image_count=500),
                dict(id=4, frequency="c", image_count=5)]
        b = frequency_bands(cats)
        assert (b[1], b[2], b[3]) == ("r", "c", "f")
        assert b[4] == "c"  # explicit field wins


class TestPolygonRaster:
    def test_rect_polygon_exact(self):
        # rectangle [2, 1] .. [6, 4] -> pixel centers 2..5 x 1..3
        m = polygon_to_mask([[2, 1, 6, 1, 6, 4, 2, 4]], 6, 8)
        exp = np.zeros((6, 8), bool)
        exp[1:4, 2:6] = True
        assert (m == exp).all()

    def test_triangle_area(self):
        m = polygon_to_mask([[0, 0, 20, 0, 0, 20]], 20, 20)
        # half the 20x20 square, pixel-quantized
        assert abs(m.sum() - 200) < 25

    def test_uncompressed_rle_column_major(self):
        # 3x2: column-major runs [1 zero, 2 ones, 3 zeros]
        m = rle_to_mask(dict(counts=[1, 2, 3], size=[3, 2]), 3, 2)
        exp = np.array([[0, 0], [1, 0], [1, 0]], bool)
        assert (m == exp).all()

    def test_compressed_rle_rejected(self):
        with pytest.raises(NotImplementedError):
            rle_to_mask(dict(counts="abc", size=[3, 2]), 3, 2)

    def test_ann_to_mask_dispatch(self):
        assert ann_to_mask([[0, 0, 4, 0, 4, 4, 0, 4]], 8, 8).sum() > 0
        assert ann_to_mask(dict(counts=[64], size=[8, 8]), 8, 8).sum() == 0


class TestMaskAP:
    def _mk(self, h=16, w=16):
        g = np.zeros((2, h, w), bool)
        g[0, 2:8, 2:8] = True
        g[1, 10:15, 10:15] = True
        return g

    def test_iou_matrix(self):
        g = self._mk()
        ious = mask_iou_matrix(g, g)
        assert np.allclose(np.diag(ious), 1.0)
        assert ious[0, 1] == 0.0

    def test_perfect_masks_ap1(self):
        g = self._mk()
        ann = dict(masks=g, labels=np.array([0, 0]))
        seg = [dict(scores=np.array([0.9, 0.8]), masks=g)]
        res = eval_mask_ap([seg], [ann], num_classes=1)
        assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
        assert res["AP@50"] == pytest.approx(1.0, abs=1e-6)

    def test_half_overlap_counts_at_50_not_95(self):
        g = self._mk()
        shifted = np.roll(g, 2, axis=2)  # IoU ~0.5-0.6 per instance
        ann = dict(masks=g, labels=np.array([0, 0]))
        seg = [dict(scores=np.array([0.9, 0.8]), masks=shifted)]
        res = eval_mask_ap([seg], [ann], num_classes=1)
        assert res["AP@50"] > 0.5
        assert res["mAP"] < res["AP@50"]


class TestDatasetWiring:
    def _write_lvis(self, tmp_path):
        imgs = [
            dict(id=0, file_name="a.jpg", width=32, height=32,
                 neg_category_ids=[2], not_exhaustive_category_ids=[]),
            dict(id=1, file_name="b.jpg", width=32, height=32,
                 neg_category_ids=[], not_exhaustive_category_ids=[1]),
        ]
        anns = [dict(id=0, image_id=0, category_id=1, bbox=[2, 2, 10, 10],
                     area=100, iscrowd=0),
                dict(id=1, image_id=1, category_id=1, bbox=[4, 4, 8, 8],
                     area=64, iscrowd=0)]
        cats = [dict(id=1, name="cat_a", frequency="r", image_count=3),
                dict(id=2, name="cat_b", frequency="f", image_count=900)]
        p = tmp_path / "lvis.json"
        p.write_text(json.dumps(dict(images=imgs, annotations=anns,
                                     categories=cats)))
        return str(p)

    def test_lvis_dataset_evaluate(self, tmp_path):
        from lowlightenvironmentvideoobjectdetection_tpu.data.extra_datasets import (
            LVISDataset,
        )

        ds = LVISDataset(self._write_lvis(tmp_path), test_mode=True)
        assert ds.class_bands == ("r", "f")
        ann0 = ds.get_ann_info(ds.data_infos[0])
        assert ann0["neg_labels"] == (1,)
        ann1 = ds.get_ann_info(ds.data_infos[1])
        assert ann1["not_exhaustive_labels"] == (0,)
        results = [
            [det([2, 2, 12, 12, 0.9]), np.zeros((0, 5), np.float32)],
            [np.zeros((0, 5), np.float32), np.zeros((0, 5), np.float32)],
        ]
        res = ds.evaluate(results)
        # image 1's cat_a gt is excluded (not exhaustive) -> only image 0
        # counts, and its detection is exact
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        assert res["APr"] == pytest.approx(1.0, abs=1e-6)

    def test_cityscapes_mask_evaluate(self, tmp_path):
        from lowlightenvironmentvideoobjectdetection_tpu.data.extra_datasets import (
            CityscapesDataset,
        )

        imgs = [dict(id=0, file_name="x.jpg", width=16, height=16)]
        anns = [dict(id=0, image_id=0, category_id=1,
                     bbox=[2, 2, 6, 6], area=36, iscrowd=0,
                     segmentation=[[2, 2, 8, 2, 8, 8, 2, 8]])]
        cats = [dict(id=c + 1, name=n) for c, n in
                enumerate(CityscapesDataset.CLASSES)]
        p = tmp_path / "cs.json"
        p.write_text(json.dumps(dict(images=imgs, annotations=anns,
                                     categories=cats)))
        ds = CityscapesDataset(ann_file=str(p), test_mode=True)
        gm = ds.get_ann_masks(ds.data_infos[0])
        assert gm["masks"].shape == (1, 16, 16) and gm["masks"].sum() == 36
        seg = [[dict(scores=np.array([0.9]), masks=gm["masks"][:1])]
               + [dict(scores=np.zeros((0,)),
                       masks=np.zeros((0, 16, 16), bool))
                  for _ in range(7)]]
        res = ds.evaluate(seg, metric="cityscapes")
        assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
        assert res["AP@50"] == pytest.approx(1.0, abs=1e-6)
