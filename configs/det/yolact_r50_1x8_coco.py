# YOLACT R-50 550px (reference: mmdetection/configs/yolact/yolact_r50_1x8_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="YOLACT", num_classes=80, depth=50)
