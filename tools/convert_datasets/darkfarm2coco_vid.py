#!/usr/bin/env python
"""DarkFarm camera dataset -> COCO-VID json
(reference: tools/convert_datasets/darkfarm2coco_vid.py:36-51 — parse
train/val video lists of noisy frames with sibling GT/ clean frames)."""
import argparse, json, os

CLASSES = ("person", "cow", "sheep", "dog", "rabbit", "cat", "hen", "duck")

def convert(root, list_file, out_file):
    videos, images, anns = [], [], []
    img_id = ann_id = 0
    names = [l.strip() for l in open(list_file) if l.strip()]
    for vid, name in enumerate(names, start=1):
        videos.append(dict(id=vid, name=name))
        frame_dir = os.path.join(root, name)
        frames = sorted(f for f in os.listdir(frame_dir)
                        if f.lower().endswith((".jpg", ".png")))
        for fid, fname in enumerate(frames):
            img_id += 1
            images.append(dict(
                id=img_id, video_id=vid, frame_id=fid,
                file_name=os.path.join(name, fname),
                # sizes filled by the loader when absent
            ))
            ann_path = os.path.join(frame_dir, fname + ".txt")
            if os.path.exists(ann_path):
                for line in open(ann_path):
                    c, x, y, w, h, *rest = line.split()
                    ann_id += 1
                    anns.append(dict(
                        id=ann_id, image_id=img_id,
                        category_id=int(c) + 1,
                        bbox=[float(x), float(y), float(w), float(h)],
                        area=float(w) * float(h), iscrowd=0,
                        instance_id=int(rest[0]) if rest else -1,
                    ))
    out = dict(
        videos=videos, images=images, annotations=anns,
        categories=[dict(id=i + 1, name=n) for i, n in enumerate(CLASSES)],
    )
    json.dump(out, open(out_file, "w"))
    print(f"wrote {out_file}: {len(videos)} videos, {len(images)} images, "
          f"{len(anns)} anns")

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root"); p.add_argument("list_file"); p.add_argument("out")
    a = p.parse_args()
    convert(a.root, a.list_file, a.out)
