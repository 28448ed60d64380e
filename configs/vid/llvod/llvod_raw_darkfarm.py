# RAW (RGGB 8ch pair) variant: unprocess sRGB -> RAW in the pipeline,
# detector/cleaner take 4 input channels.
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaDarkfarmDetect", in_channels=4,
             backbone_in_channels=4)
train_pipeline = [
    dict(type="LoadMutiImagePairsFromFile"),
    dict(type="SeqLoadAnnotations"),
    dict(type="SeqResize", img_scale=(1000, 600)),
    dict(type="SeqsRGB2RAW", share_params=True),
    dict(type="SeqNormalizeRAW", mean=[0.25, 0.25, 0.25, 0.25],
         std=[0.12, 0.12, 0.12, 0.12]),
    dict(type="SeqPad", size_divisor=16),
    dict(type="VideoCollect", keys=["img", "gt_bboxes", "gt_labels"]),
    dict(type="ConcatVideoReferences"),
    dict(type="SeqDefaultFormatBundle"),
]
