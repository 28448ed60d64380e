# Insert-plugins RDB ablation (reference:
# done/llvod_l1234_insert_plugins_i1234_333_darkfarm.py —
# insert_cfg num_blocks=3 num_layers=3).
_base_ = ["llvod_l1234_insert_plugins_i1234_133_darkfarm.py"]
model = dict(
    backbone_overrides=dict(
        plugin_stages=(0, 1, 2, 3),
        plugin_type="aggregator",
        plugin_rdb_blocks=3,
        plugin_rdb_layers=3,
        plugin_emb_nums=3,
    ),
)
