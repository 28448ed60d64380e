#!/usr/bin/env python
"""LaSOT -> COCO-VID json (reference: tools/convert_datasets/lasot2coco.py)."""
import argparse, json, os

def convert(root, out_file, split_file=None):
    names = ([l.strip() for l in open(split_file)] if split_file else
             sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))))
    videos, images, anns = [], [], []
    img_id = ann_id = 0
    for vid, name in enumerate(names, start=1):
        cls = name.rsplit("-", 1)[0]
        seq = os.path.join(root, cls, name)
        gtf = os.path.join(seq, "groundtruth.txt")
        if not os.path.exists(gtf):
            continue
        videos.append(dict(id=vid, name=name))
        for fid, line in enumerate(open(gtf)):
            x, y, w, h = (float(v) for v in line.strip().split(","))
            img_id += 1; ann_id += 1
            images.append(dict(id=img_id, video_id=vid, frame_id=fid,
                               file_name=os.path.join(cls, name, "img", f"{fid+1:08d}.jpg")))
            anns.append(dict(id=ann_id, image_id=img_id, category_id=1,
                             bbox=[x, y, w, h], area=w * h, iscrowd=0,
                             instance_id=1))
    json.dump(dict(videos=videos, images=images, annotations=anns,
                   categories=[dict(id=1, name="object")]),
              open(out_file, "w"))
    print(f"wrote {out_file}: {len(videos)} sequences")

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root"); p.add_argument("out"); p.add_argument("--split-file", default=None)
    a = p.parse_args()
    convert(a.root, a.out, a.split_file)
