# ATSS R-50 FPN 1x (reference: mmdetection/configs/atss/atss_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="ATSS", num_classes=80, depth=50)
