# selsa_tra + ResNetH on DarkFarm (reference:
# done/llvod_selsa_tra_rh50_l34_darkfarm.py).
_base_ = ["llvod_selsa_tra_r50_l34_darkfarm.py"]
model = dict(backbone_variant="ResNetH")
