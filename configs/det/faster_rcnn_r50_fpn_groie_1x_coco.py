# GRoIE generic RoI extraction (reference family:
# mmdetection/configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="GRoIEFasterRCNN", num_classes=80)
