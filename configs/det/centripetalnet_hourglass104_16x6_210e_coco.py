# CentripetalNet Hourglass-104 (reference: mmdetection/configs/centripetalnet/centripetalnet_hourglass104_mstest_16x6_210e_coco.py).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="CentripetalNet", num_classes=80)
