# FastDVDnet end-to-end baseline: in-model image-space denoiser over 5-frame
# windows, then SELSA detection on the denoised frames (reference:
# llvod_fastdvdnet_darkfarm.py — type='SelsaFastDVDnetDetect').
_base_ = ["llvod_fastdvd_darkfarm.py"]
