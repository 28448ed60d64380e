# GridRCNN detector config (reference family: mmdetection/configs/grid_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="GridRCNN", num_classes=80)
