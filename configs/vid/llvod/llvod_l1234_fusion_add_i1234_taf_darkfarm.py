# Ablation: taf on, rdb off
# (reference: llvod_l1234_fusion_add_i1234_taf_darkfarm.py)
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(agg_rdb=False, agg_taf=True)
