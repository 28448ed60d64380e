#!/usr/bin/env python
"""ImageNet-VID xml annotations -> COCO-VID json
(reference: tools/convert_datasets/imagenet2coco_vid.py — per-video frame
ordering, instance ids, is_vid_train_frame flags)."""
import argparse, json, os
import xml.etree.ElementTree as ET

def convert(vid_root, ann_root, out_file, classes_file=None):
    wnids = {}
    if classes_file:
        for i, line in enumerate(open(classes_file)):
            wnids[line.split()[0]] = i + 1
    videos, images, anns = [], [], []
    img_id = ann_id = 0
    for vid, vdir in enumerate(sorted(os.listdir(ann_root)), start=1):
        vpath = os.path.join(ann_root, vdir)
        if not os.path.isdir(vpath):
            continue
        videos.append(dict(id=vid, name=vdir))
        for fid, xml in enumerate(sorted(os.listdir(vpath))):
            tree = ET.parse(os.path.join(vpath, xml))
            img_id += 1
            size = tree.find("size")
            images.append(dict(
                id=img_id, video_id=vid, frame_id=fid,
                file_name=os.path.join(vdir, xml.replace(".xml", ".JPEG")),
                width=int(size.find("width").text),
                height=int(size.find("height").text),
                is_vid_train_frame=True,
            ))
            for obj in tree.findall("object"):
                wnid = obj.find("name").text
                cat = wnids.setdefault(wnid, len(wnids) + 1)
                bb = obj.find("bndbox")
                x1, y1 = int(bb.find("xmin").text), int(bb.find("ymin").text)
                x2, y2 = int(bb.find("xmax").text), int(bb.find("ymax").text)
                ann_id += 1
                tid = obj.find("trackid")
                anns.append(dict(
                    id=ann_id, image_id=img_id, category_id=cat,
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1), iscrowd=0,
                    instance_id=int(tid.text) if tid is not None else -1,
                ))
    out = dict(videos=videos, images=images, annotations=anns,
               categories=[dict(id=i, name=w) for w, i in wnids.items()])
    json.dump(out, open(out_file, "w"))
    print(f"wrote {out_file}: {len(videos)} videos, {len(images)} images")

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("vid_root"); p.add_argument("ann_root"); p.add_argument("out")
    p.add_argument("--classes", default=None)
    a = p.parse_args()
    convert(a.vid_root, a.ann_root, a.out, a.classes)
