# On-the-fly A7S3 noise on ImageNet-VID, no cleaner loss
# (reference: configs/vid/llvod/llvod_noise_vid_a7s3.py).
_base_ = ["../selsa/selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py"]
model = dict(_delete_=True, type="SelsaNoiseDetect", num_classes=30,
             out_indices=(3, 3))
train_pipeline = [
    dict(type="LoadMultiImagesFromFile"),
    dict(type="SeqLoadAnnotations"),
    dict(type="SeqResize", img_scale=(1000, 600)),
    dict(type="SeqAddNoise", noise_type="a7s3", share_params=True),
    dict(type="SeqNormalize"),
    dict(type="SeqPad", size_divisor=16),
    dict(type="VideoCollect", keys=["img", "gt_bboxes", "gt_labels"]),
    dict(type="ConcatVideoReferences"),
    dict(type="SeqDefaultFormatBundle"),
]
