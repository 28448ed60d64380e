# Fusion (no "add") variant of the flagship: identical model, trained at
# the full (1000, 600) scale with ref frame_range=4 (reference diff:
# llvod_l1234_fusion_i1234_darkfarm.py vs llvod_l1234_fusion_add_i1234_
# darkfarm.py — SeqResize scale and ref sampler range only).
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
data = dict(
    train=dict(
        ref_img_sampler=dict(
            num_ref_imgs=2, frame_range=4, filter_key_img=True,
            method="bilateral_uniform",
        ),
    ),
)
