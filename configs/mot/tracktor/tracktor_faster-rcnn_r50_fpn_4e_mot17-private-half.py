# Tracktor (reference: configs/mot/tracktor/...).
_base_ = ["../deepsort/deepsort_faster-rcnn_fpn_4e_mot17-private-half.py"]
model = dict(_delete_=True, type="Tracktor", num_classes=1)
tracker = dict(regression_thr=0.5, with_cmc=True, with_linear_motion=False)
