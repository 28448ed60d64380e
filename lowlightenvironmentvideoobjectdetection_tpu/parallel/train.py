"""Data-parallel training over a TPU mesh.

The reference's only training parallelism is DDP over NCCL
(mmtracking/mmtrack/apis/train.py:63-71, tools/dist_train.sh). The TPU-native
equivalent: one ``jit``-compiled train step with the batch axis sharded over a
``jax.sharding.Mesh`` ('data' axis) and parameters replicated; XLA inserts the
gradient all-reduce over ICI. The reference's "1 video sample per GPU"
restriction disappears — per-sample work is vmapped.

Optimizer parity: SGD(lr=.01, momentum=.9, weight_decay=1e-4) with grad-clip
max_norm=35 (selsa_faster_rcnn config), warmup 500 iters at ratio 1/3, step
decay at epochs [2, 5]. Frozen-stage parameters (zero grads via the
backbone's stop_gradient) are masked out of weight decay.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


FROZEN_PREFIXES = ("backbone/conv1", "backbone/bn1", "backbone/layer1",
                   "cleaner")


def frozen_mask(params, frozen_prefixes=FROZEN_PREFIXES) -> Any:
    """Pytree mask: True = trainable.

    Matches the reference's frozen stem + stage 1 (``frozen_stages=1``) AND
    the frozen cleaner teacher (mmtrack/models/vid/base.py:39-52
    ``freeze_module('cleaner')`` — requires_grad=False there means the
    parameters never move at all, including under weight decay). Prefixes
    match at ANY depth, so nested trees like ``selsa/backbone/conv1`` and
    ``cleaner/...`` are caught."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        keys = "/" + "/".join(
            p.key for p in path if isinstance(p, jax.tree_util.DictKey)
        )
        # prefix match at a path-segment boundary, at ANY depth: 'backbone/
        # layer1' catches 'selsa/backbone/layer1_0/conv1' (flax flattens
        # block indices into the stage name)
        return not any(f"/{f}" in keys for f in frozen_prefixes)

    leaves = {jax.tree_util.keystr(p): trainable(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: leaves[jax.tree_util.keystr(p)], params
    )


def make_lr_schedule(
    base_lr: float = 0.01,
    warmup_iters: int = 500,
    warmup_ratio: float = 1.0 / 3.0,
    step_epochs: Tuple[int, ...] = (2, 5),
    iters_per_epoch: int = 1000,
    gamma: float = 0.1,
) -> optax.Schedule:
    """mmcv 'step' policy with linear warmup."""

    def sched(count):
        warm = base_lr * (
            warmup_ratio + (1 - warmup_ratio) * jnp.minimum(count, warmup_iters) / warmup_iters
        )
        epoch = count // iters_per_epoch
        decay = jnp.ones_like(warm)
        for e in step_epochs:
            decay = decay * jnp.where(epoch >= e, gamma, 1.0)
        return warm * decay

    return sched


def make_optimizer(
    params,
    lr: Callable | float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip_norm: float = 35.0,
    frozen_prefixes: Tuple[str, ...] = FROZEN_PREFIXES,
) -> optax.GradientTransformation:
    """SGD + momentum + masked weight decay + grad clip.

    Frozen subtrees (stem/stage-1, cleaner teacher) are masked out of BOTH
    weight decay and the final update — reference semantics are
    requires_grad=False, i.e. the parameter never changes at all
    (mmtrack/models/vid/base.py:39-52). stop_gradient alone only zeroes
    grads; wd would still decay the distillation target toward zero."""
    mask = frozen_mask(params, frozen_prefixes)
    frozen = jax.tree_util.tree_map(lambda t: not t, mask)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.masked(optax.add_decayed_weights(weight_decay), mask),
        optax.sgd(learning_rate=lr, momentum=momentum),
        # hard-zero the update on frozen leaves: bit-identical params forever
        optax.masked(optax.set_to_zero(), frozen),
    )


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class Trainer:
    """Builds the sharded, compiled train step for a per-sample loss fn.

    loss_fn(variables, batch_element, rng) -> (loss, metrics) where
    batch_element is one video sample; the Trainer vmaps it over the leading
    batch axis and shards that axis across the mesh.
    """

    loss_fn: Callable
    optimizer: optax.GradientTransformation
    mesh: Mesh

    def init_state(self, variables) -> TrainState:
        return TrainState(variables, self.optimizer.init(variables), jnp.zeros((), jnp.int32))

    def make_step(self):
        mesh = self.mesh
        optimizer = self.optimizer
        loss_fn = self.loss_fn

        def step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
            def batched_loss(variables):
                b = jax.tree_util.tree_leaves(batch)[0].shape[0]
                rngs = jax.random.split(rng, b)
                losses, metrics = jax.vmap(
                    lambda be, r: loss_fn(variables, be, r)
                )(batch, rngs)
                return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

            (_, metrics), grads = jax.value_and_grad(batched_loss, has_aux=True)(
                state.params
            )
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )


def make_sot_lr_schedule(
    base_lr: float = 0.005,
    warmup_epochs: int = 5,
    total_epochs: int = 20,
    iters_per_epoch: int = 1000,
    start_factor: float = 0.2,
    end_lr_factor: float = 0.1,
) -> "optax.Schedule":
    """SiamRPN++ schedule (reference: mmtrack/core/optimizer/
    sot_lr_updater.py): linear warmup over the first epochs, then log-space
    decay to ``base_lr * end_lr_factor``."""
    import jax.numpy as _jnp

    warm_iters = warmup_epochs * iters_per_epoch
    total_iters = total_epochs * iters_per_epoch

    def sched(count):
        frac = _jnp.clip(count / max(warm_iters, 1), 0.0, 1.0)
        warm = base_lr * (start_factor + (1 - start_factor) * frac)
        decay_frac = _jnp.clip(
            (count - warm_iters) / max(total_iters - warm_iters, 1), 0.0, 1.0)
        decay = base_lr * _jnp.exp(
            _jnp.log(_jnp.asarray(end_lr_factor)) * decay_frac)
        return _jnp.where(count < warm_iters, warm, decay)

    return sched


def unfreeze_mask_at_epoch(params, epoch: int, unfreeze_epoch: int = 10,
                           backbone_prefix: str = "backbone") -> Any:
    """SiamRPN++ backbone unfreezing (reference: sot_optimizer_hook.py):
    before ``unfreeze_epoch`` the backbone is frozen (mask False); after it,
    trainable. Combine with ``optax.masked`` per-epoch."""
    unfrozen = epoch >= unfreeze_epoch
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        keys = "/".join(p.key for p in path
                        if isinstance(p, jax.tree_util.DictKey))
        in_backbone = f"/{backbone_prefix}/" in f"/{keys}/"
        return (not in_backbone) or unfrozen

    leaves = {jax.tree_util.keystr(p): trainable(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: leaves[jax.tree_util.keystr(p)], params
    )
