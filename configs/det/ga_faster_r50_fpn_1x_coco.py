# Guided-anchoring Faster R-CNN (reference family:
# mmdetection/configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="GAFasterRCNN", num_classes=80)
