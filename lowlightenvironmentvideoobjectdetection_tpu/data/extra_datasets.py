"""Remaining mmdet dataset families.

Parity targets:
- CityscapesDataset: mmdetection/mmdet/datasets/cityscapes.py:22 — a
  CocoDataset over COCO-converted Cityscapes annotations with the 8 traffic
  classes (the reference's txt/png export needs the cityscapesscripts pip
  package and is out of scope for both codebases' vendored deps).
- WIDERFaceDataset: wider_face.py:17 — XML-style single-class face set.
- DeepFashionDataset: deepfashion.py — CocoDataset with 15 garment classes.
- LVISV05 / LVISV1: lvis.py:16/:473 — the reference delegates parsing to the
  external ``lvis`` pip package; LVIS jsons are COCO-shaped, so here the
  same CocoVID-based parser reads them directly, with classes taken from the
  json's own category table (LVIS's 1203-entry table would be noise to
  vendor).
"""

from __future__ import annotations

import json

from .coco_det import CocoDataset
from .voc import XMLDataset


class CityscapesDataset(CocoDataset):
    CLASSES = ("person", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")

    def get_ann_masks(self, img_info: dict):
        """Decoded [G, H, W] bool gt instance masks + labels, aligned with
        ``get_ann_info``'s filtering (cityscapes.py:100-160)."""
        from ..core.eval.instseg import ann_to_mask

        h, w = img_info["height"], img_info["width"]
        masks, labels = [], []
        for a in self.coco.img_to_anns[img_info["id"]]:
            if a.get("iscrowd", 0) or a.get("ignore", 0):
                continue
            if a["category_id"] not in self.cat2label:
                continue
            x, y, bw, bh = a["bbox"]
            if bw < 1 or bh < 1:
                continue
            masks.append(ann_to_mask(a["segmentation"], h, w))
            labels.append(self.cat2label[a["category_id"]])
        import numpy as np

        return dict(
            masks=np.asarray(masks, bool).reshape(-1, h, w),
            labels=np.asarray(labels, np.int64),
        )

    def evaluate(self, results, metric="bbox", seg_results=None, **kw):
        """metric='bbox': COCO AP over box results; metric='cityscapes':
        native instance-mask mAP/AP@50 (cityscapes.py:207-284 — the
        reference shells out to cityscapesscripts for the same numbers)."""
        if metric == "cityscapes":
            from ..core.eval.instseg import eval_mask_ap

            anns = [self.get_ann_masks(i) for i in self.data_infos]
            return eval_mask_ap(
                seg_results if seg_results is not None else results,
                anns, num_classes=len(self.CLASSES), **kw)
        from ..core.eval.mean_ap import eval_coco_ap

        anns = [self.get_ann_info(i) for i in self.data_infos]
        return eval_coco_ap(results, anns, **kw)


class DeepFashionDataset(CocoDataset):
    CLASSES = ("top", "skirt", "leggings", "dress", "outer", "pants", "bag",
               "neckwear", "headwear", "eyeglass", "belt", "footwear", "hair",
               "skin", "face")


class WIDERFaceDataset(XMLDataset):
    CLASSES = ("face",)

    def __init__(self, **kwargs):
        kwargs.setdefault("img_subdir", "")
        super().__init__(**kwargs)


class LVISDataset(CocoDataset):
    """LVIS v0.5/v1 jsons parsed directly (they are COCO-shaped); classes
    come from the annotation file's category table ordered by id.

    ``evaluate`` runs the native federated LVIS protocol
    (core/eval/lvis_eval.py) — AP / APr / APc / APf — in place of the
    reference's external ``lvis`` package (mmdet lvis.py:309)."""

    def __init__(self, ann_file: str, **kwargs):
        with open(ann_file) as f:
            cats = json.load(f).get("categories", [])
        cats = sorted(cats, key=lambda c: c["id"])
        classes = tuple(c["name"] for c in cats)
        kwargs.setdefault("filter_empty_gt", True)
        super().__init__(ann_file=ann_file, classes=classes or None, **kwargs)
        from ..core.eval.lvis_eval import frequency_bands

        bands = frequency_bands(cats)
        # label-space band per class ('f' when the table carries neither a
        # frequency nor an image_count field)
        self.class_bands = tuple(
            bands.get(cid, "f") for cid in self.cat_ids)

    def get_ann_info(self, img_info: dict):
        ann = super().get_ann_info(img_info)
        # the LVIS image record's federated-evaluation fields, mapped into
        # label space (ids outside the class table are dropped)
        for src, dst in (("neg_category_ids", "neg_labels"),
                         ("not_exhaustive_category_ids",
                          "not_exhaustive_labels")):
            ann[dst] = tuple(
                self.cat2label[c] for c in img_info.get(src, ())
                if c in self.cat2label)
        return ann

    def evaluate(self, results, **kw):
        """results: per image, per class [N, 5] arrays (dataset order)."""
        from ..core.eval.lvis_eval import eval_lvis

        anns = [self.get_ann_info(info) for info in self.data_infos]
        return eval_lvis(results, anns, self.class_bands, **kw)


LVISV05Dataset = LVISDataset


class LVISV1Dataset(LVISDataset):
    pass
