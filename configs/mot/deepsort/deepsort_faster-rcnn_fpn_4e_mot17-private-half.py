# DeepSORT (reference: configs/mot/deepsort/...private-half.py).
_base_ = ["../../_base_/default_runtime.py"]
model = dict(type="DeepSORT", num_classes=1, with_reid=True)
tracker = dict(
    obj_score_thr=0.5, reid_thr=2.0, iou_thr=0.5, num_tentatives=2,
    num_frames_retain=100,
)
dataset_type = "MOTChallengeDataset"
data_root = "data/MOT17/"
data = dict(
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/half-val_cocoformat.json",
        img_prefix=data_root + "train",
        test_mode=True,
    ),
)
