# SparseRCNN detector config (reference family: mmdetection/configs/sparse_rcnn/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="SparseRCNN", num_classes=80)
