# FCOS R-50 FPN (reference: mmdetection/configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="FCOS", num_classes=80, depth=50)
