# FoveaBox R-50 FPN (reference: mmdetection/configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="FoveaBox", num_classes=80, depth=50)
