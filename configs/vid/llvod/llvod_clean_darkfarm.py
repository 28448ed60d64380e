# Oracle baseline: train on the CLEAN half of each pair
# (reference: llvod_clean_darkfarm.py)
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaCleanDarkfarmDetect", out_indices=(3, 3))
