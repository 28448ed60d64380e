# Insert-plugins variant: a DenoisingAggregator (RDB + TAF) appended inside
# EVERY backbone stage (i1234), feature loss on stages 3-4 (l34). Reference:
# configs/vid/llvod/llvod_insert_plugins_l34_i1234_vid_a7s3.py:16-32 —
# InsertResNet insert_tag=[T,T,T,T], insert_cfg type='DenoisingAggregator'
# num_blocks=1 num_layers=8 emb_nums=3 with_rdb with_taf.
_base_ = ["llvod_noise_vid_a7s3.py"]
model = dict(
    out_indices=(2, 3, 3),
    backbone_variant="InsertResNet",
    backbone_overrides=dict(
        plugin_stages=(0, 1, 2, 3),
        plugin_type="aggregator",
        plugin_rdb_blocks=1,
        plugin_rdb_layers=8,
        plugin_emb_nums=3,
    ),
)
