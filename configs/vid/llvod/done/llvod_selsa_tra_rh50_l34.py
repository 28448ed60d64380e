# selsa_tra with the ResNetH backbone variant (reference:
# done/llvod_selsa_tra_rh50_l34.py — type='SelsaDarkDetect',
# backbone type='ResNetH').
_base_ = ["llvod_selsa_tra_r50_l34.py"]
model = dict(backbone_variant="ResNetH")
