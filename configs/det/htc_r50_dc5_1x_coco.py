# HTC detector config (reference family: mmdetection/configs/htc/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="HTC", num_classes=80)
