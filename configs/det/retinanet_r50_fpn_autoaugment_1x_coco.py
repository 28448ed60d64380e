# RetinaNet with AutoAugment policies (reference family: mmdetection/
# configs/autoaugment/ — policy container over Shear/Rotate/Translate).
_base_ = ["retinanet_r50_fpn_1x_coco.py"]
data = dict(
    train=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_train2017.json",
        img_prefix="data/coco/train2017/",
        pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="LoadAnnotations", with_bbox=True),
            dict(type="AutoAugment", policies=[
                [dict(type="Shear", level=4.0, prob=0.5)],
                [dict(type="Rotate", level=6.0, prob=0.5)],
                [dict(type="Translate", level=4.0, prob=0.5),
                 dict(type="BrightnessTransform", level=4.0, prob=0.5)],
            ]),
            dict(type="Resize", img_scale=(1000, 600)),
            dict(type="RandomFlip", flip_ratio=0.5),
            dict(type="Normalize"),
            dict(type="Pad", size_divisor=16),
        ],
    ),
)
