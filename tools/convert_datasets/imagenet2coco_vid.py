#!/usr/bin/env python
"""ImageNet-VID xml annotations -> COCO-VID json, list-driven with exact
reference output semantics (tools/convert_datasets/imagenet2coco_vid.py):

- train: ``Lists/VID_train_15frames.txt`` rows ``video_path 1 frame_1based
  num_frames`` -> every frame of the video is emitted, with
  ``is_vid_train_frame`` true exactly for the (frame-1) entries of the list
  (ref :107) and the video carrying ``vid_train_frames``;
- val: ``Lists/VID_val_videos_8.txt`` rows ``video_path ... num_frames``;
- per-video ``instance_id`` from a trackid map advancing a global counter;
- objects outside the 30 VID classes are skipped; frames without objects
  still emit an image row;
- output ``imagenet_vid_8_{mode}.json`` (mmcv.dump json formatting).

Field orders match the reference dicts so a fixture-tree conversion is
byte-comparable against the reference converter's output
(tests/test_converter_fidelity.py).
"""
import argparse
import json
import os
import os.path as osp
import xml.etree.ElementTree as ET

CLASSES = ('airplane', 'antelope', 'bear', 'bicycle', 'bird', 'bus', 'car',
           'cattle', 'dog', 'domestic_cat', 'elephant', 'fox', 'giant_panda',
           'hamster', 'horse', 'lion', 'lizard', 'monkey', 'motorcycle',
           'rabbit', 'red_panda', 'sheep', 'snake', 'squirrel', 'tiger',
           'train', 'turtle', 'watercraft', 'whale', 'zebra')

CLASSES_ENCODES = ('n02691156', 'n02419796', 'n02131653', 'n02834778',
                   'n01503061', 'n02924116', 'n02958343', 'n02402425',
                   'n02084071', 'n02121808', 'n02503517', 'n02118333',
                   'n02510455', 'n02342885', 'n02374451', 'n02129165',
                   'n01674464', 'n02484322', 'n03790512', 'n02324045',
                   'n02509815', 'n02411705', 'n01726692', 'n02355227',
                   'n02129604', 'n04468005', 'n01662784', 'n04530566',
                   'n02062744', 'n02391049')

CATS_ID_MAPS = {v: k for k, v in enumerate(CLASSES_ENCODES, 1)}


def list_from_file(path):
    return [l.rstrip("\n") for l in open(path)]


def parse_train_list(ann_dir):
    """``VID_train_15frames.txt``: video, 1, frame(1-based), num_frames."""
    infos = {}
    for line in list_from_file(
            osp.join(ann_dir, 'Lists/VID_train_15frames.txt')):
        f = line.split(' ')
        if f[0] not in infos:
            infos[f[0]] = dict(vid_train_frames=[int(f[2]) - 1],
                               num_frames=int(f[-1]))
        else:
            infos[f[0]]['vid_train_frames'].append(int(f[2]) - 1)
    return infos


def parse_val_list(ann_dir):
    infos = {}
    for line in list_from_file(
            osp.join(ann_dir, 'Lists/VID_val_videos_8.txt')):
        f = line.split(' ')
        infos[f[0]] = dict(num_frames=int(f[-1]))
    return infos


def convert_vid(vid, ann_dir, save_dir, mode='train'):
    assert mode in ('train', 'val')
    rec = dict(vid_id=1, img_id=1, ann_id=1, global_instance_id=1,
               num_vid_train_frames=0, num_no_objects=0)
    xml_dir = osp.join(ann_dir, 'Annotations/VID/')
    vid_infos = parse_train_list(ann_dir) if mode == 'train' \
        else parse_val_list(ann_dir)
    for name in vid_infos:
        instance_id_maps = {}
        vid_train_frames = vid_infos[name].get('vid_train_frames', [])
        rec['num_vid_train_frames'] += len(vid_train_frames)
        vid['videos'].append(dict(id=rec['vid_id'], name=name,
                                  vid_train_frames=vid_train_frames))
        for frame_id in range(vid_infos[name]['num_frames']):
            img_prefix = osp.join(name, '%06d' % frame_id)
            root = ET.parse(osp.join(xml_dir, f'{img_prefix}.xml')).getroot()
            size = root.find('size')
            vid['images'].append(dict(
                file_name=f'{img_prefix}.JPEG',
                height=int(size.find('height').text),
                width=int(size.find('width').text),
                id=rec['img_id'], frame_id=frame_id,
                video_id=rec['vid_id'],
                is_vid_train_frame=frame_id in vid_train_frames))
            objs = root.findall('object')
            if objs == []:
                rec['num_no_objects'] += 1
                rec['img_id'] += 1
                continue
            for obj in objs:
                name_ = obj.find('name').text
                if name_ not in CATS_ID_MAPS:
                    continue
                bb = obj.find('bndbox')
                x1, y1 = int(bb.find('xmin').text), int(bb.find('ymin').text)
                x2, y2 = int(bb.find('xmax').text), int(bb.find('ymax').text)
                track_id = obj.find('trackid').text
                if track_id in instance_id_maps:
                    instance_id = instance_id_maps[track_id]
                else:
                    instance_id = rec['global_instance_id']
                    rec['global_instance_id'] += 1
                    instance_id_maps[track_id] = instance_id
                vid['annotations'].append(dict(
                    id=rec['ann_id'], video_id=rec['vid_id'],
                    image_id=rec['img_id'],
                    category_id=CATS_ID_MAPS[name_],
                    instance_id=instance_id,
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1), iscrowd=False,
                    occluded=obj.find('occluded').text == '1',
                    generated=obj.find('generated').text == '1'))
                rec['ann_id'] += 1
            rec['img_id'] += 1
        rec['vid_id'] += 1
    out = osp.join(save_dir, f'imagenet_vid_8_{mode}.json')
    with open(out, 'w') as f:
        json.dump(vid, f)
    print(f"wrote {out}: {rec['vid_id'] - 1} videos, "
          f"{rec['img_id'] - 1} images, {rec['ann_id'] - 1} objects, "
          f"{rec['num_vid_train_frames']} vid train frames, "
          f"{rec['num_no_objects']} empty frames")


def base_json():
    return dict(categories=[
        dict(id=k, name=v, encode_name=CLASSES_ENCODES[k - 1])
        for k, v in enumerate(CLASSES, 1)], videos=[], images=[],
        annotations=[])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-i', '--input', required=True,
                   help='root of ImageNet VID annotations')
    p.add_argument('-o', '--output', required=True)
    p.add_argument('--mode', choices=('train', 'val', 'both'), default='val',
                   help='reference main() converts val only; both = also '
                        'the 15-frame train list')
    a = p.parse_args()
    os.makedirs(a.output, exist_ok=True)
    modes = ('train', 'val') if a.mode == 'both' else (a.mode,)
    for m in modes:
        convert_vid(base_json(), a.input, a.output, m)


if __name__ == '__main__':
    main()
