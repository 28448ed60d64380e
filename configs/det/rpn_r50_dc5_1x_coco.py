# RPN detector config (reference family: mmdetection/configs/rpn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="RPN", num_classes=80)
