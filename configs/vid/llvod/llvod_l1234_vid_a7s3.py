# ImageNet-VID + on-the-fly A7S3 camera noise, feature loss on stages 1-4
# (reference: llvod_l1234_vid_a7s3.py)
_base_ = ["llvod_noise_vid_a7s3.py"]
model = dict(type="SelsaNewVIDDetect", out_indices=(0, 1, 2, 3, 3),
             loss_type="l1")
