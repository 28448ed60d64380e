# FastRCNN detector config (reference family: mmdetection/configs/fast_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="FastRCNN", num_classes=80)
