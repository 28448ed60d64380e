# Ablation: NO feature-consistency loss (detector-only on noisy pairs)
# (reference: llvod_no_loss_darkfarm.py)
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(type="SelsaNoiseDarkfarmDetect", out_indices=(3, 3))
