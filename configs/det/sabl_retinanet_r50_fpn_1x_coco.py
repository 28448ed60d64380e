# SABL RetinaNet R-50 (reference: mmdetection/configs/sabl/sabl_retinanet_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="SABL", num_classes=80, depth=50)
