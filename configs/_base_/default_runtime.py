# Runtime defaults (reference: configs/_base_/default_runtime.py).
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
total_epochs = 7
optimizer = dict(type="sgd", lr=0.01, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="step", step=[2, 5], warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3)
work_dir = "./work_dirs"
