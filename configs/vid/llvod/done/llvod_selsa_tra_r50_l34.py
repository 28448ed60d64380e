# "selsa_tra" = SELSA + Temporal RoI Align. Plain R50, feature loss on
# stages 3-4, ImageNet-VID with synthetic noise (reference:
# done/llvod_selsa_tra_r50_l34.py — type='SelsaDarkDetect',
# out_indices=(2,3,3), TemporalRoIAlign + 3 shared FCs).
_base_ = ["../llvod_noise_vid_a7s3.py"]
model = dict(
    type="SelsaDarkDetect",
    num_classes=30,
    out_indices=(2, 3, 3),
    loss_type="l2",
    roi_extractor="temporal",
    num_shared_fcs=3,
)
