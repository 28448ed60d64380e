# FGFA R-50-DC5 (reference: configs/vid/fgfa/fgfa_faster_rcnn_r50_dc5_1x_imagenetvid.py).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="FGFA")
