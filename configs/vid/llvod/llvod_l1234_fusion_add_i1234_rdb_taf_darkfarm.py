# The reference's canonical LLVOD config
# (configs/vid/llvod/llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py):
# SelsaNewDarkfarmDetect on DarkFarm pairs — feature loss on stages 1-4
# (out_indices (0,1,2,3,3)), Denoising2 aggregator with RDB + TAF fusion.
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/default_runtime.py",
]
model = dict(
    type="SelsaNewDarkfarmDetect",
    num_classes=8,
    out_indices=(0, 1, 2, 3, 3),
    loss_type="l1",
    # reference llvod_*.py:51-60: TemporalRoIAlign key-roi extractor
    # (2 most-similar points, 4 temporal attention blocks) + 3 shared FCs
    roi_extractor="temporal",
    num_shared_fcs=3,
)
dataset_type = "DarkFarmVIDDataset"
data_root = "data/darkfarm/"
train_pipeline = [
    dict(type="LoadMutiImagePairsFromFile"),
    dict(type="SeqLoadAnnotations"),
    dict(type="SeqResize", img_scale=(1000, 600)),
    dict(type="SeqBrighten", m=0.25),
    dict(type="SeqRandomFlip", share_params=True, flip_ratio=0.5),
    dict(type="SeqNormalize"),
    dict(type="SeqPad", size_divisor=16),
    dict(type="VideoCollect", keys=["img", "gt_bboxes", "gt_labels"]),
    dict(type="ConcatVideoReferences"),
    dict(type="SeqDefaultFormatBundle"),
]
test_pipeline = [
    dict(type="LoadImagePairsFromFile"),
    dict(type="Resize", img_scale=(1000, 600)),
    dict(type="Brighten", m=0.25),
    dict(type="NormalizePairs"),
    dict(type="Pad", size_divisor=16),
    dict(type="VideoCollect", keys=["img"]),
]
data = dict(
    samples_per_gpu=1,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/darkfarm_train.json",
        img_prefix=data_root,
        ref_img_sampler=dict(
            num_ref_imgs=2, frame_range=9, filter_key_img=True,
            method="bilateral_uniform",
        ),
        pipeline=train_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/darkfarm_val.json",
        img_prefix=data_root,
        ref_img_sampler=dict(
            num_ref_imgs=14, frame_range=[-7, 7],
            method="test_with_adaptive_stride",
        ),
        pipeline=test_pipeline,
        test_mode=True,
    ),
)
