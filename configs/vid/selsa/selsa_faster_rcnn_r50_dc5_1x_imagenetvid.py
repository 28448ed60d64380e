# SELSA R-50-DC5 1x ImageNet-VID
# (reference: configs/vid/selsa/selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="SELSA", num_ref_frames=14)

# reference-exact proposal budget (faster_rcnn_r50_dc5.py:25-29): nms_pre
# 6000/600 train (now also the framework default), 6000/300 test. The
# framework's TEST default of 2000 is the measured perf/recall-equivalent
# window (tools/bench_nms_pre.py); this config pins the parity value.
model = dict(model, train_nms_pre=6000, test_nms_pre=6000)
