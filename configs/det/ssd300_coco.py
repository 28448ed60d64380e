# SSD300 VGG-16 (reference: mmdetection/configs/ssd/ssd300_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="SSD", num_classes=80)
