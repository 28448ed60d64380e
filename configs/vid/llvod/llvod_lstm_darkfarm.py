# ConvLSTM DarkResNet backbone era baseline (reference: slesa_dark_detect.py).
_base_ = ["llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(_delete_=True, type="SelsaDarkDetect", num_classes=8,
             out_indices=(0, 1, 2, 3, 3))
