# SCNet detector config (reference family: mmdetection/configs/scnet/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="SCNet", num_classes=80)
