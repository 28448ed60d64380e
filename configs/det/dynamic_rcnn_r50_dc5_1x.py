# Dynamic R-CNN (reference family: mmdetection/configs/dynamic_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="DynamicRCNN", num_classes=80)
