# Cascade RPN proposer (reference family: mmdetection/configs/cascade_rpn/
# crpn_r50_caffe_fpn_1x_coco.py — two RPN stages with adaptive convs;
# stage 1 RegionAssigner + linear IoU, stage 2 MaxIoU .7 + 256@.5 sampling).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="CascadeRPN", num_classes=1)
