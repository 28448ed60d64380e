# NAS-FCOS (reference: mmdetection/configs/nas_fcos/nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="NASFCOS", num_classes=80, depth=50)
