# ImageNet-VID FGFA-style data (reference: _base_/datasets/imagenet_vid_fgfa_style.py):
# train: 2 refs bilateral_uniform range 9; test: 14 refs adaptive stride.
dataset_type = "ImagenetVIDDataset"
data_root = "data/ILSVRC/"
train_pipeline = [
    dict(type="LoadMultiImagesFromFile"),
    dict(type="SeqLoadAnnotations"),
    dict(type="SeqResize", img_scale=(1000, 600)),
    dict(type="SeqRandomFlip", share_params=True, flip_ratio=0.5),
    dict(type="SeqNormalize"),
    dict(type="SeqPad", size_divisor=16),
    dict(type="VideoCollect", keys=["img", "gt_bboxes", "gt_labels"]),
    dict(type="ConcatVideoReferences"),
    dict(type="SeqDefaultFormatBundle"),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(1000, 600)),
    dict(type="Normalize"),
    dict(type="Pad", size_divisor=16),
    dict(type="VideoCollect", keys=["img"]),
]
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/imagenet_vid_train.json",
        img_prefix=data_root + "Data/VID",
        ref_img_sampler=dict(
            num_ref_imgs=2, frame_range=9, filter_key_img=True,
            method="bilateral_uniform",
        ),
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/imagenet_vid_val.json",
        img_prefix=data_root + "Data/VID",
        ref_img_sampler=dict(
            num_ref_imgs=14, frame_range=[-7, 7], method="test_with_adaptive_stride",
        ),
        pipeline=test_pipeline,
        test_mode=True,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/imagenet_vid_val.json",
        img_prefix=data_root + "Data/VID",
        ref_img_sampler=dict(
            num_ref_imgs=14, frame_range=[-7, 7], method="test_with_adaptive_stride",
        ),
        pipeline=test_pipeline,
        test_mode=True,
    ),
)
