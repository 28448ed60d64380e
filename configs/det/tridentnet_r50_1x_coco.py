# TridentFasterRCNN detector config (reference family: mmdetection/configs/tridentnet/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="TridentFasterRCNN", num_classes=80)
