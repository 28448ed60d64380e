# RepPoints moment R-50 FPN 1x (reference: mmdetection/configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="RepPoints", num_classes=80, depth=50)
