# NAS-FPN RetinaNet R-50 (reference: mmdetection/configs/nas_fpn/
# retinanet_r50_nasfpn_crop640_50e_coco.py): NASFPN neck (stack 7) +
# RetinaSepBNHead (shared conv kernels, per-level norm).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="NASFPNRetinaNet", num_classes=80, depth=50, stack_times=7)
