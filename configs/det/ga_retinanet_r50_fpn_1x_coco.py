# GARetinaNet detector config (reference family: mmdetection/configs/guided_anchoring/).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="GARetinaNet", num_classes=80)
