# PAA R-50 FPN 1x (reference: mmdetection/configs/paa/paa_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="PAA", num_classes=80, depth=50)
