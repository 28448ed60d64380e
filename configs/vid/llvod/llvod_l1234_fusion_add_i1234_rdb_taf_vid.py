# Flagship aggregator model on ImageNet-VID with synthetic a7s3 noise
# instead of DarkFarm disk pairs (reference:
# llvod_l1234_fusion_add_i1234_rdb_taf_vid.py — type='SelsaNewVIDDetect',
# 30 classes).
_base_ = ["llvod_noise_vid_a7s3.py"]
model = dict(
    type="SelsaNewVIDDetect",
    num_classes=30,
    out_indices=(0, 1, 2, 3, 3),
    loss_type="l1",
    roi_extractor="temporal",
    num_shared_fcs=3,
)
