# SELSA + Temporal RoI Align, R-50-DC5, 7 epochs, ImageNet-VID
# (reference: configs/vid/selsa/selsa_troialign_faster_rcnn_r50_dc5_7e_
# imagenetvid.py:12-21 — TemporalRoIAlign with num_most_similar_points=2,
# num_temporal_attention_blocks=4, and num_shared_fcs=3).
_base_ = ["selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py"]
model = dict(
    roi_extractor="temporal",
    troi_similar_points=2,
    troi_attention_blocks=4,
    num_shared_fcs=3,
)
total_epochs = 7
