# CornerNet Hourglass-104 (reference: mmdetection/configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="CornerNet", num_classes=80)
