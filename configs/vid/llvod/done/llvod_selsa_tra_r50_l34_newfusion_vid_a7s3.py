# selsa_tra + denoising aggregator ("newfusion") on VID a7s3 noise
# (reference: done/llvod_selsa_tra_r50_l34_newfusion_vid_a7s3.py —
# type='SelsaNewDetect').
_base_ = ["llvod_selsa_tra_r50_l34.py"]
model = dict(type="SelsaNewDetect")
