# PointRend detector config (reference family: mmdetection/configs/point_rend/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="PointRend", num_classes=80)
