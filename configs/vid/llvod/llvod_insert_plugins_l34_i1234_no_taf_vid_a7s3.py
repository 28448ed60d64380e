# InsertResNet plugin variant without TAF
# (reference: llvod_insert_plugins_l34_i1234_no_taf_vid_a7s3.py —
# insert_cfg with_taf=False).
_base_ = ["llvod_insert_plugins_l34_i1234_vid_a7s3.py"]
model = dict(
    backbone_overrides=dict(
        plugin_stages=(0, 1, 2, 3),
        plugin_type="aggregator",
        plugin_rdb_blocks=1,
        plugin_rdb_layers=8,
        plugin_emb_nums=3,
        plugin_with_taf=False,
    ),
)
