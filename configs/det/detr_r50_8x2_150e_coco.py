# DETR R-50 (reference: mmdetection/configs/detr/detr_r50_8x2_150e_coco.py):
# 6 encoder + 6 decoder layers, 100 queries, per-decoder-layer aux losses.
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="DETR", num_classes=80, num_queries=100,
             enc_layers=6, dec_layers=6)
