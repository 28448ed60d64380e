# Ablation: feature loss on stages 2-4
# (reference: llvod_l234_darkfarm.py — out_indices (1,2,3,3))
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaDarkfarmDetect", out_indices=(1, 2, 3, 3))
