from . import anchors, assigners, boxes, nms  # noqa: F401
from .anchors import AnchorGenerator  # noqa: F401
from .assigners import (  # noqa: F401
    AssignResult,
    max_iou_assign,
    random_sample_gather,
    random_sample_masks,
)
from .boxes import (  # noqa: F401
    bbox2delta,
    bbox_overlaps,
    clip_boxes,
    delta2bbox,
    flip_boxes,
    scale_boxes,
)
from .nms import batched_nms, multiclass_nms, nms_fixed  # noqa: F401
