# Ablation: only the UNDENOISED branch's feature loss
# (reference: llvod_l1234u_fusion_add_i1234_darkfarm.py)
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(dual_branch="u")
