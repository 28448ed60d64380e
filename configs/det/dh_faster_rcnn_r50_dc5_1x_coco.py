# Double-Head R-CNN (reference family: mmdetection/configs/double_heads/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="DoubleHeadRCNN", num_classes=80)
