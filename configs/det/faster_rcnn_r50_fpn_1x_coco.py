# Multi-level FPN Faster R-CNN (reference: configs/faster_rcnn/
# faster_rcnn_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="FasterRCNNFPN", num_classes=80)
