# Ablation: SmoothL1 feature-consistency loss
# (reference: llvod_l1234_smoothl1_darkfarm.py)
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(loss_type="smooth_l1")
