# FreeAnchor RetinaNet R-50 (reference: mmdetection/configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="FreeAnchor", num_classes=80, depth=50)
