"""Pascal VOC (XML-style) detection dataset.

Parity targets: mmdetection/mmdet/datasets/xml_style.py:13 (XMLDataset —
image-set txt listing + per-image XML annotation parsing, min_size →
ignore) and voc.py:11 (VOCDataset — the 20 VOC classes, year inference,
AP evaluated with the VOC2007 11-point metric for year 2007 else the area
metric, via ``core/eval/mean_ap.py``).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence

import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
    "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class XMLDataset:
    """Image-set txt of ids; per-id ``Annotations/<id>.xml`` + JPEG image."""

    CLASSES: Sequence[str] = ()

    def __init__(self, ann_file: str, img_prefix: str = "",
                 img_subdir: str = "JPEGImages",
                 ann_subdir: str = "Annotations",
                 min_size: Optional[int] = None, test_mode: bool = False,
                 classes: Optional[Sequence[str]] = None):
        if classes is not None:
            self.CLASSES = tuple(classes)
        assert self.CLASSES, "CLASSES in XMLDataset can not be empty"
        self.img_prefix = img_prefix
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.min_size = min_size
        self.test_mode = test_mode
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        with open(ann_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.data_infos: List[dict] = []
        for img_id in ids:
            filename = os.path.join(img_subdir, f"{img_id}.jpg")
            xml_path = os.path.join(img_prefix, ann_subdir, f"{img_id}.xml")
            width = height = 0
            if os.path.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find("size")
                if size is not None:
                    width = int(size.find("width").text)
                    height = int(size.find("height").text)
            self.data_infos.append(dict(
                id=img_id, filename=filename, file_name=filename,
                width=width, height=height))

    def __len__(self):
        return len(self.data_infos)

    def get_ann_info(self, img_info: dict) -> Dict[str, np.ndarray]:
        xml_path = os.path.join(self.img_prefix, self.ann_subdir,
                                f"{img_info['id']}.xml")
        boxes, labels, boxes_ig, labels_ig = [], [], [], []
        root = ET.parse(xml_path).getroot()
        for obj in root.findall("object"):
            name = obj.find("name").text
            if name not in self.cat2label:
                continue
            label = self.cat2label[name]
            difficult = obj.find("difficult")
            difficult = 0 if difficult is None else int(difficult.text)
            bnd = obj.find("bndbox")
            # VOC is 1-indexed inclusive (xml_style.py bbox - 1)
            bbox = [
                int(float(bnd.find("xmin").text)) - 1,
                int(float(bnd.find("ymin").text)) - 1,
                int(float(bnd.find("xmax").text)) - 1,
                int(float(bnd.find("ymax").text)) - 1,
            ]
            ignore = False
            if self.min_size is not None and not self.test_mode:
                w = bbox[2] - bbox[0]
                h = bbox[3] - bbox[1]
                if w < self.min_size or h < self.min_size:
                    ignore = True
            if difficult or ignore:
                boxes_ig.append(bbox)
                labels_ig.append(label)
            else:
                boxes.append(bbox)
                labels.append(label)
        return dict(
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(boxes_ig, np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(labels_ig, np.int64),
        )

    def __getitem__(self, idx: int) -> dict:
        info = dict(self.data_infos[idx])
        return dict(img_info=info, ann=self.get_ann_info(info))

    def evaluate(self, det_lists, iou_thr: float = 0.5):
        """VOC mAP over accumulated per-image, per-class detections."""
        from ..core.eval.mean_ap import eval_map

        annotations = [self.get_ann_info(d) for d in self.data_infos]
        mode = "11points" if getattr(self, "year", 0) == 2007 else "area"
        mean_ap, results = eval_map(det_lists, annotations, iou_thr=iou_thr,
                                    mode=mode)
        return {"mAP": mean_ap, "per_class": results}


class VOCDataset(XMLDataset):
    CLASSES = VOC_CLASSES

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if "VOC2007" in self.img_prefix:
            self.year = 2007
        elif "VOC2012" in self.img_prefix:
            self.year = 2012
        else:
            self.year = 0  # reference raises; we default to the area metric
