# MaskScoringRCNN detector config (reference family: mmdetection/configs/ms_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="MaskScoringRCNN", num_classes=80)
