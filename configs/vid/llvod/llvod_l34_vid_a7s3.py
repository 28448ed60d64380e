# ImageNet-VID + A7S3 noise, feature loss on stages 3-4
# (reference: llvod_l34_vid_a7s3.py)
_base_ = ["llvod_noise_vid_a7s3.py"]
model = dict(type="SelsaNewVIDDetect", out_indices=(2, 3, 3), loss_type="l1")
