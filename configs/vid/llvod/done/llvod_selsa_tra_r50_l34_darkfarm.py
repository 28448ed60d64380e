# selsa_tra on DarkFarm disk pairs (reference:
# done/llvod_selsa_tra_r50_l34_darkfarm.py — type='SelsaDarkfarmDetect',
# out_indices=(2,3,3)).
_base_ = ["../llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(
    type="SelsaDarkfarmDetect",
    out_indices=(2, 3, 3),
)
