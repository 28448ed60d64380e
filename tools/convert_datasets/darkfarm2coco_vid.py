#!/usr/bin/env python
"""DarkFarm camera dataset -> COCO-VID json, exact reference semantics
(tools/convert_datasets/darkfarm2coco_vid.py):

- train rows ``video_path frame num_frames`` in
  ``Lists/darkfarm_vid_train.txt`` give ``vid_train_frames`` (0-based ids
  used as-is, unlike the ImageNet list's 1-based column);
- per-frame xml lives beside the CLEAN frames:
  ``<first 3 path components of video>/GT/<frame>.xml`` (ref :89-91);
- frames are ``<video>/<frame>.JPG``; no instance tracking — every
  annotation carries the never-advancing ``global_instance_id`` (== 1),
  ``occluded``/``generated`` false (ref :120-147 commented-out block);
- the reference ``main`` converts EVERY ``Lists/*.txt`` except
  ``darkfarm_vid_train.txt``/``darkfarm_vid_val.txt`` (its txt_ignore),
  writing ``<prefix>.json``; the train branch always reads the fixed
  ``darkfarm_vid_train.txt`` regardless of the prefix.

Shared with the GT-pair and 600x400 variants via the knobs below.
"""
import argparse
import json
import os
import os.path as osp
import xml.etree.ElementTree as ET

CLASSES = ('person', 'cow', 'sheep', 'dog', 'rabbit', 'cat', 'hen', 'duck')
CATS_ID_MAPS = {v: k for k, v in enumerate(CLASSES, 1)}


def list_from_file(path):
    return [l.rstrip("\n") for l in open(path)]


def parse_train_list(ann_dir, train_list='Lists/darkfarm_vid_train.txt'):
    infos = {}
    for line in list_from_file(osp.join(ann_dir, train_list)):
        f = line.split(' ')
        if f[0] not in infos:
            infos[f[0]] = dict(vid_train_frames=[int(f[1])],
                               num_frames=int(f[-1]))
        else:
            infos[f[0]]['vid_train_frames'].append(int(f[1]))
    return infos


def parse_val_list(ann_dir, prefix):
    infos = {}
    for line in list_from_file(osp.join(ann_dir, f'Lists/{prefix}.txt')):
        f = line.split(' ')
        infos[f[0]] = dict(num_frames=int(f[-1]))
    return infos


def xml_path_noisy(ann_dir, vid_info, frame_id):
    """xml beside the clean frames: <3-component prefix>/GT/<frame>.xml."""
    parts = vid_info.split('/')
    prefix = os.sep.join(parts[:3])
    return osp.join(ann_dir, prefix, 'GT', '%d.xml' % frame_id)


def xml_path_gt(ann_dir, vid_info, frame_id):
    """GT-pair variant (darkfarm2coco_vid_gt.py:89-91): xml inside the
    video directory itself."""
    return osp.join(ann_dir, vid_info, '%d.xml' % frame_id)


def convert_darkfarm(vid, ann_dir, save_dir, mode='train', prefix='',
                     xml_path_fn=xml_path_noisy,
                     train_list='Lists/darkfarm_vid_train.txt',
                     file_ext='JPG', out_size=None):
    """``out_size=(600, 400)`` activates the 600x400 variant: .png frames,
    fixed image size, box coords rescaled with int truncation and clamped
    (darkfarm2coco_600x400.py:97-125)."""
    assert mode in ('train', 'val')
    rec = dict(vid_id=1, img_id=1, ann_id=1, global_instance_id=1,
               num_vid_train_frames=0, num_no_objects=0)
    vid_infos = parse_train_list(ann_dir, train_list) if mode == 'train' \
        else parse_val_list(ann_dir, prefix)
    for vid_info in vid_infos:
        vid_train_frames = vid_infos[vid_info].get('vid_train_frames', [])
        rec['num_vid_train_frames'] += len(vid_train_frames)
        vid['videos'].append(dict(id=rec['vid_id'], name=vid_info,
                                  vid_train_frames=vid_train_frames))
        for frame_id in range(vid_infos[vid_info]['num_frames']):
            img_prefix = osp.join(vid_info, '%d' % frame_id)
            root = ET.parse(xml_path_fn(ann_dir, vid_info,
                                        frame_id)).getroot()
            size = root.find('size')
            width = int(size.find('width').text)
            height = int(size.find('height').text)
            if out_size is not None:
                n_width, n_height = out_size
            else:
                n_width, n_height = width, height
            vid['images'].append(dict(
                file_name=f'{img_prefix}.{file_ext}',
                height=n_height, width=n_width,
                id=rec['img_id'], frame_id=frame_id,
                video_id=rec['vid_id'],
                is_vid_train_frame=frame_id in vid_train_frames))
            objs = root.findall('object')
            if objs == []:
                rec['num_no_objects'] += 1
                rec['img_id'] += 1
                continue
            for obj in objs:
                name = obj.find('name').text
                if name not in CLASSES:
                    continue
                bb = obj.find('bndbox')
                x1, y1 = int(bb.find('xmin').text), int(bb.find('ymin').text)
                x2, y2 = int(bb.find('xmax').text), int(bb.find('ymax').text)
                if out_size is not None:
                    x1 = max(min(int(x1 * n_width / width), n_width), 0)
                    y1 = max(min(int(y1 * n_height / height), n_height), 0)
                    x2 = max(min(int(x2 * n_width / width), n_width), 0)
                    y2 = max(min(int(y2 * n_height / height), n_height), 0)
                vid['annotations'].append(dict(
                    id=rec['ann_id'], video_id=rec['vid_id'],
                    image_id=rec['img_id'],
                    category_id=CATS_ID_MAPS[name],
                    instance_id=rec['global_instance_id'],
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1), iscrowd=False,
                    occluded=False, generated=False))
                rec['ann_id'] += 1
            rec['img_id'] += 1
        rec['vid_id'] += 1
    out = osp.join(save_dir, prefix + '.json')
    with open(out, 'w') as f:
        json.dump(vid, f)
    print(f"wrote {out}: {rec['vid_id'] - 1} videos, "
          f"{rec['img_id'] - 1} images, {rec['ann_id'] - 1} objects")


def base_json():
    return dict(categories=[dict(id=k, name=v)
                            for k, v in enumerate(CLASSES, 1)],
                videos=[], images=[], annotations=[])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-i', '--input', required=True,
                   help='DarkFarm root (with Lists/)')
    p.add_argument('-o', '--output', required=True)
    a = p.parse_args()
    os.makedirs(a.output, exist_ok=True)
    txt_ignore = ('darkfarm_vid_train.txt', 'darkfarm_vid_val.txt')
    for txt in os.listdir(osp.join(a.input, 'Lists')):
        if txt in txt_ignore or not txt.endswith('.txt'):
            continue
        mode = 'train' if 'train' in txt else 'val'
        convert_darkfarm(base_json(), a.input, a.output, mode, txt[:-4])


if __name__ == '__main__':
    main()
