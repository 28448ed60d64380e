# L1 feature-loss ablation, no aggregator (reference:
# done/llvod_l1234_l1_darkfarm.py — type='SelsaDarkfarmDetect',
# loss_type l1 on stages 1-4).
_base_ = ["../llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaDarkfarmDetect", loss_type="l1")
