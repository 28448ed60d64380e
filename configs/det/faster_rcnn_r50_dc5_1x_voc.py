# Faster R-CNN on Pascal VOC (reference family: mmdetection/configs/
# pascal_voc/faster_rcnn_r50_fpn_1x_voc0712.py — 20 classes, VOCDataset).
_base_ = ["faster_rcnn_r50_dc5_1x_coco.py"]
model = dict(num_classes=20)
dataset_type = "VOCDataset"
data_root = "data/VOCdevkit/"
data = dict(
    train=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/trainval.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="LoadAnnotations", with_bbox=True),
            dict(type="Resize", img_scale=(1000, 600)),
            dict(type="RandomFlip", flip_ratio=0.5),
            dict(type="Normalize"),
            dict(type="Pad", size_divisor=16),
        ],
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(1000, 600)),
            dict(type="Normalize"),
            dict(type="Pad", size_divisor=16),
        ],
        test_mode=True,
    ),
)
