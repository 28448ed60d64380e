# Clean oracle on ImageNet-VID with noise synthesis DISABLED
# (reference: done/llvod_clean_vid_no_add.py — type='SelsaCleanDetect',
# pipeline noise model 'no_add': the pair degenerates to (clean, clean)).
_base_ = ["../llvod_noise_vid_a7s3.py"]
model = dict(
    _delete_=True,
    type="SelsaCleanDetect",
    num_classes=30,
    out_indices=(3, 3),
    roi_extractor="temporal",
    num_shared_fcs=3,
)
train_pipeline = [
    dict(type="LoadMultiImagesFromFile"),
    dict(type="SeqLoadAnnotations"),
    dict(type="SeqResize", img_scale=(1000, 600)),
    dict(type="SeqAddNoise", noise_type="no_add", share_params=True),
    dict(type="SeqNormalize"),
    dict(type="SeqPad", size_divisor=16),
    dict(type="VideoCollect", keys=["img", "gt_bboxes", "gt_labels"]),
    dict(type="ConcatVideoReferences"),
    dict(type="SeqDefaultFormatBundle"),
]
data = dict(train=dict(pipeline=train_pipeline))
