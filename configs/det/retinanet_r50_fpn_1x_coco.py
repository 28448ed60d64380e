# RetinaNet R-50 FPN (reference: mmdetection/configs/retinanet/...).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="RetinaNet", num_classes=80, depth=50)
