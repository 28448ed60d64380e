# PISA two-stage (reference family: mmdetection/configs/pisa/
# pisa_faster_rcnn_r50_fpn_1x_coco.py — ScoreHLR sampler + ISR-P + CARL).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="PISAFasterRCNN", num_classes=80)
