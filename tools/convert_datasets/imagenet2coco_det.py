#!/usr/bin/env python
"""ImageNet-DET xml annotations -> COCO json for VID+DET joint training
(reference: tools/convert_datasets/imagenet2coco_det.py — still images get
``is_vid_train_frame=False`` so the VID sampler treats them as key-only;
the llvod_noise_vid_a7s3 config's second dataset entry consumes this)."""
import argparse
import json
import os
import xml.etree.ElementTree as ET


def convert(img_root, ann_root, out_file, classes_file=None):
    wnids = {}
    if classes_file:
        for i, line in enumerate(open(classes_file)):
            wnids[line.split()[0]] = i + 1
    images, anns = [], []
    img_id = ann_id = 0
    for sub in sorted(os.listdir(ann_root)):
        spath = os.path.join(ann_root, sub)
        xmls = [sub] if sub.endswith(".xml") else (
            sorted(os.listdir(spath)) if os.path.isdir(spath) else [])
        base = ann_root if sub.endswith(".xml") else spath
        for xml in xmls:
            tree = ET.parse(os.path.join(base, xml))
            img_id += 1
            size = tree.find("size")
            fname = tree.find("filename").text
            images.append(dict(
                id=img_id,
                file_name=os.path.join(sub if not sub.endswith(".xml")
                                       else "", fname + ".JPEG"),
                width=int(size.find("width").text),
                height=int(size.find("height").text),
                is_vid_train_frame=False,
            ))
            for obj in tree.findall("object"):
                name = obj.find("name").text
                cat = wnids.get(name)
                if classes_file and cat is None:
                    continue
                b = obj.find("bndbox")
                x1, y1 = float(b.find("xmin").text), float(b.find("ymin").text)
                x2, y2 = float(b.find("xmax").text), float(b.find("ymax").text)
                ann_id += 1
                anns.append(dict(
                    id=ann_id, image_id=img_id,
                    category_id=cat if cat is not None else 1,
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1), iscrowd=0, instance_id=-1,
                ))
    out = dict(videos=[], images=images, annotations=anns,
               categories=[dict(id=i, name=str(i))
                           for i in sorted({a["category_id"] for a in anns})])
    json.dump(out, open(out_file, "w"))
    print(f"wrote {out_file}: {len(images)} images, {len(anns)} anns")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("img_root")
    p.add_argument("ann_root")
    p.add_argument("out")
    p.add_argument("--classes-file", default=None)
    a = p.parse_args()
    convert(a.img_root, a.ann_root, a.out, a.classes_file)
