# InsertResNet plugin variant without TAF
# (reference: llvod_insert_plugins_l34_i1234_no_taf_vid_a7s3.py)
_base_ = ["llvod_insert_plugins_l34_i1234_vid_a7s3.py"]
model = dict(agg_taf=False)
