# Feature loss on stage 4 only (reference: done/llvod_l4_darkfarm.py:19
# out_indices=(3,3)), no aggregator.
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaDarkfarmDetect", out_indices=(3, 3))
