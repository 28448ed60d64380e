# Insert-plugins RDB ablation (reference:
# done/llvod_l1234_insert_plugins_i1234_633_darkfarm.py —
# insert_cfg num_blocks=6 num_layers=3).
_base_ = ["llvod_l1234_insert_plugins_i1234_133_darkfarm.py"]
model = dict(
    backbone_overrides=dict(
        plugin_stages=(0, 1, 2, 3),
        plugin_type="aggregator",
        plugin_rdb_blocks=6,
        plugin_rdb_layers=3,
        plugin_emb_nums=3,
    ),
)
