# Feature loss on stages 3+4 (reference: done/llvod_l34_darkfarm.py:19
# out_indices=(2,3,3)).
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaDarkfarmDetect", out_indices=(2, 3, 3))
