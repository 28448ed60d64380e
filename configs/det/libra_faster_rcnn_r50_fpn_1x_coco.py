# Libra R-CNN (reference family: mmdetection/configs/libra_rcnn/ — BFP
# non-local neck + IoU-balanced sampling + BalancedL1).
_base_ = ["../_base_/default_runtime.py"]
model = dict(type="LibraFasterRCNN", num_classes=80)
