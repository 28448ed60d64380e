# Ablation: rdb on, taf off
# (reference: llvod_l1234_fusion_add_i1234_rdb_darkfarm.py)
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(agg_rdb=True, agg_taf=False)
