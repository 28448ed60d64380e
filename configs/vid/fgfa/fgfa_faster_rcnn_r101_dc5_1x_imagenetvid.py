# FGFA R-101-DC5
# (reference: configs/vid/fgfa/fgfa_faster_rcnn_r101_dc5_1x_imagenetvid.py;
# model-zoo AP@50 77.8 @ 6.4 fps, configs/vid/fgfa/README.md:25).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="FGFA", depth=101)
