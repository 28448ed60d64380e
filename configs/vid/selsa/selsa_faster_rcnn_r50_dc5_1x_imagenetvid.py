# SELSA R-50-DC5 1x ImageNet-VID
# (reference: configs/vid/selsa/selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="SELSA", num_ref_frames=14)

# reference-exact proposal budget (faster_rcnn_r50_dc5.py:25-29): nms_pre
# 6000/600 train, 6000/300 test. The framework default of 2000 is the
# perf-tuned setting; this config pins the accuracy-parity values.
model = dict(model, train_nms_pre=6000, test_nms_pre=6000)
