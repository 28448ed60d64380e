# Two-stage baseline: FastDVDnet image-space denoiser then SELSA
# (reference: selsa_fastdvd_darkfarm.py model).
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(_delete_=True, type="SelsaFastDVDnetDetect", num_classes=8)
