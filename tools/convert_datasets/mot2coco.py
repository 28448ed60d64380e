#!/usr/bin/env python
"""MOT17 gt.txt -> COCO-VID json (reference: tools/convert_datasets/mot2coco.py)."""
import argparse, configparser, json, os

def convert(mot_root, out_file, split="train"):
    videos, images, anns = [], [], []
    img_id = ann_id = 0
    root = os.path.join(mot_root, split)
    for vid, name in enumerate(sorted(os.listdir(root)), start=1):
        seq = os.path.join(root, name)
        ini = os.path.join(seq, "seqinfo.ini")
        if not os.path.exists(ini):
            continue
        info = configparser.ConfigParser(); info.read(ini)
        n = int(info["Sequence"]["seqLength"])
        w, h = int(info["Sequence"]["imWidth"]), int(info["Sequence"]["imHeight"])
        videos.append(dict(id=vid, name=name, fps=int(info["Sequence"]["frameRate"])))
        frame2img = {}
        for f in range(1, n + 1):
            img_id += 1
            frame2img[f] = img_id
            images.append(dict(id=img_id, video_id=vid, frame_id=f - 1,
                               file_name=os.path.join(name, "img1", f"{f:06d}.jpg"),
                               width=w, height=h))
        gt = os.path.join(seq, "gt", "gt.txt")
        if os.path.exists(gt):
            for line in open(gt):
                f, tid, x, y, bw, bh, conf, cls, vis = line.split(",")[:9]
                if int(cls) != 1 or not int(conf):
                    continue
                ann_id += 1
                anns.append(dict(id=ann_id, image_id=frame2img[int(f)],
                                 category_id=1,
                                 bbox=[float(x), float(y), float(bw), float(bh)],
                                 area=float(bw) * float(bh), iscrowd=0,
                                 instance_id=int(tid),
                                 visibility=float(vis)))
    json.dump(dict(videos=videos, images=images, annotations=anns,
                   categories=[dict(id=1, name="pedestrian")]),
              open(out_file, "w"))
    print(f"wrote {out_file}: {len(videos)} seqs, {len(images)} frames, {len(anns)} boxes")

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("mot_root"); p.add_argument("out"); p.add_argument("--split", default="train")
    a = p.parse_args()
    convert(a.mot_root, a.out, a.split)
