# Plain Faster R-CNN detector config.
_base_ = ["../_base_/models/faster_rcnn_r50_dc5.py",
          "../_base_/default_runtime.py"]
model = dict(num_classes=80)
