# SELSA R-101-DC5 1x ImageNet-VID
# (reference: configs/vid/selsa/selsa_faster_rcnn_r101_dc5_1x_imagenetvid.py;
# model-zoo AP@50 81.5 @ 7.2 fps, configs/vid/selsa/README.md:25).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="SELSA", depth=101, num_ref_frames=14)
