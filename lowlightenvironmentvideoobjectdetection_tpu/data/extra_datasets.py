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
    come from the annotation file's category table ordered by id."""

    def __init__(self, ann_file: str, **kwargs):
        with open(ann_file) as f:
            cats = json.load(f).get("categories", [])
        classes = tuple(
            c["name"] for c in sorted(cats, key=lambda c: c["id"]))
        kwargs.setdefault("filter_empty_gt", True)
        super().__init__(ann_file=ann_file, classes=classes or None, **kwargs)


LVISV05Dataset = LVISDataset


class LVISV1Dataset(LVISDataset):
    pass
