# Canonical VID detector (reference: configs/_base_/models/faster_rcnn_r50_dc5.py):
# R-50 DC5 (strides (1,2,2,1), dilations (1,1,1,2)), ChannelMapper 2048->512 k3,
# RPN anchors scales [4,8,16,32] ratios [.5,1,2] stride 16, RoIAlign 7x7,
# Shared2FC head. Shape knobs map onto SelsaConfig fields.
model = dict(
    type="FasterRCNN",
    num_classes=30,
    depth=50,
    neck_channels=512,
    anchor_scales=(4, 8, 16, 32),
    anchor_ratios=(0.5, 1.0, 2.0),
    stride=16,
    pad_h=608,
    pad_w=1024,
    train_nms_pre=2000,
    train_nms_post=600,
    test_nms_pre=2000,
    test_nms_post=300,
    rpn_nms_iou=0.7,
    num_roi_samples=256,
)
