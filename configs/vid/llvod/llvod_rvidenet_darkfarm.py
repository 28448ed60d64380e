# RViDeNet two-stage baseline: frames pre-denoised offline by RViDeNet are
# loaded as the "clean" half of each pair and SELSA runs on them via the
# clean-branch oracle model (reference: llvod_rvidenet_darkfarm.py —
# type='SelsaCleanDarkfarmDetect' over a `denoised/` pair tree; the denoiser
# itself is offline, not a training-time module).
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
    train=dict(img_prefix="data/darkfarm_rvidenet/"),
    test=dict(img_prefix="data/darkfarm_rvidenet/"),
)
