"""Training API: the epoch-runner equivalent.

Parity target: mmtracking/mmtrack/apis/train.py:13-135 (``train_model``:
dataloader, DDP wrap, SGD + grad-clip, LR hook, checkpoint hook, eval hook).
TPU-native shape: one pjit-compiled train step (parallel/train.py) driven by
a host loop with checkpointing (orbax) and periodic eval, batch sharded over
the mesh instead of DDP.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..parallel.train import Trainer, TrainState, create_mesh, make_lr_schedule, make_optimizer


@dataclasses.dataclass
class TrainLoop:
    """Host loop over the compiled step: logging, checkpointing, eval."""

    trainer: Trainer
    log_interval: int = 50
    checkpoint_interval: int = 1000
    checkpoint_dir: Optional[str] = None
    eval_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None
    eval_interval: int = 0

    def run(
        self,
        state: TrainState,
        data_iter: Iterable,
        num_steps: int,
        rng: jax.Array,
        log_fn: Callable[[str], None] = print,
    ) -> TrainState:
        step_fn = self.trainer.make_step()
        t0 = time.perf_counter()
        start_step = int(state.step)
        for i, batch in enumerate(data_iter):
            if i >= num_steps:
                break
            # derive the step rng from the GLOBAL step so a resumed run
            # replays the identical stream (bit-exact resume)
            sub = jax.random.fold_in(rng, start_step + i)
            state, metrics = step_fn(state, batch, sub)
            if (i + 1) % self.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                ips = self.log_interval / dt
                log_fn(
                    f"step {i + 1}/{num_steps} "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                    + f" ({ips:.2f} it/s)"
                )
            if self.checkpoint_dir and (i + 1) % self.checkpoint_interval == 0:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(self.checkpoint_dir, state, step=i + 1)
            if self.eval_fn and self.eval_interval and (i + 1) % self.eval_interval == 0:
                res = self.eval_fn(state)
                log_fn("eval: " + " ".join(f"{k}={v:.4f}" for k, v in res.items()))
        return state


def train_model(
    loss_fn: Callable,
    variables: Any,
    data_iter: Iterable,
    num_steps: int,
    base_lr: float = 0.01,
    iters_per_epoch: int = 1000,
    n_devices: Optional[int] = None,
    seed: int = 0,
    resume_from: Optional[str] = None,
    **loop_kwargs,
) -> TrainState:
    """One-call training entry (apis/train.py train_model shape).

    ``resume_from`` restores the FULL TrainState — params, optimizer
    momentum, and step (so the LR schedule continues where it left off) —
    matching the reference's ``runner.resume()``
    (mmtrack/apis/train.py:131-134). A bare-variables checkpoint warm-starts
    params only."""
    mesh = create_mesh(n_devices)
    opt = make_optimizer(
        variables, lr=make_lr_schedule(base_lr, iters_per_epoch=iters_per_epoch)
    )
    trainer = Trainer(loss_fn=loss_fn, optimizer=opt, mesh=mesh)
    state = trainer.init_state(variables)
    if resume_from:
        from ..utils.checkpoint import load_checkpoint

        try:
            restored = load_checkpoint(resume_from, target=state, unwrap=False)
        except Exception:
            # structure mismatch (e.g. a bare-variables checkpoint):
            # restore without a target and sort it out below
            restored = load_checkpoint(resume_from, unwrap=False)
        if (isinstance(restored, TrainState)
                or (hasattr(restored, "opt_state") and hasattr(restored, "step"))):
            state = TrainState(restored.params, restored.opt_state,
                               restored.step)
        elif isinstance(restored, dict) and "opt_state" in restored:
            state = TrainState(restored["params"], restored["opt_state"],
                               restored["step"])
        else:  # bare variables tree: params-only warm start
            state = trainer.init_state(restored)
    loop = TrainLoop(trainer=trainer, **loop_kwargs)
    return loop.run(state, data_iter, num_steps, jax.random.PRNGKey(seed))
