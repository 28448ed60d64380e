# MaskRCNN detector config (reference family: mmdetection/configs/mask_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="MaskRCNN", num_classes=80)
