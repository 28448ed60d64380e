# Insert-plugins RDB ablation on DarkFarm (reference:
# done/llvod_l1234_insert_plugins_i1234_133_darkfarm.py — InsertResNet,
# insert_cfg num_blocks=1 num_layers=8 emb_nums=3).
_base_ = ["../llvod_l1234_fusion_add_i1234_rdb_taf_darkfarm.py"]
model = dict(
    type="SelsaDarkfarmDetect",
    backbone_variant="InsertResNet",
    backbone_overrides=dict(
        plugin_stages=(0, 1, 2, 3),
        plugin_type="aggregator",
        plugin_rdb_blocks=1,
        plugin_rdb_layers=8,
        plugin_emb_nums=3,
    ),
)
