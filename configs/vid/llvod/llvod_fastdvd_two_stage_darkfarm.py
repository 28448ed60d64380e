# FastDVDnet two-stage baseline, offline variant: frames pre-denoised by
# FastDVDnet on disk feed the clean-branch oracle model (reference:
# llvod_fastdvd_two_stage_darkfarm.py — type='SelsaCleanDarkfarmDetect').
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(
    _delete_=True,
    type="SelsaCleanDarkfarmDetect",
    num_classes=8,
    out_indices=(3, 3),
    roi_extractor="temporal",
    num_shared_fcs=3,
)
data = dict(
    train=dict(img_prefix="data/darkfarm_fastdvd/"),
    test=dict(img_prefix="data/darkfarm_fastdvd/"),
)
