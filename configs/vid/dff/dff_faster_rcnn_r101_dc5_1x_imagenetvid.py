# DFF R-101-DC5
# (reference: configs/vid/dff/dff_faster_rcnn_r101_dc5_1x_imagenetvid.py;
# model-zoo AP@50 73.5 @ 39.8 fps, configs/vid/dff/README.md:25).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="DFF", depth=101, key_frame_interval=10)
