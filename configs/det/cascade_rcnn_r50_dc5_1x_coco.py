# CascadeRCNN detector config (reference family: mmdetection/configs/cascade_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="CascadeRCNN", num_classes=80)
