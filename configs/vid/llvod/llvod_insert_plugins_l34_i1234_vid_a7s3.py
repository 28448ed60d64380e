# Plugin-insertable backbone variant (reference:
# configs/vid/llvod/llvod_insert_plugins_l34_i1234_vid_a7s3.py:16 InsertResNet).
_base_ = ["llvod_noise_vid_a7s3.py"]
model = dict(backbone_variant="ResNet_B1")
