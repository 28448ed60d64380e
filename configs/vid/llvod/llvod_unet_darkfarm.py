# Cleaner baseline: a U-Net image denoiser feeding plain SELSA
# (reference: llvod_unet_darkfarm.py — Unet cleaner instead of FastDVDnet)
_base_ = ["llvod_fastdvd_darkfarm.py"]
model = dict(denoiser="unet")
