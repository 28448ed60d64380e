# YOLOv3 Darknet-53 (reference: mmdetection/configs/yolo/...).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="YOLOV3", num_classes=80)
