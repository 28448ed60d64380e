"""Checkpoint save/restore (orbax), with submodule-level composition.

Parity target: mmcv CheckpointHook + the reference's composite pretrain
mechanism ``pretrains=dict(detector=..., cleaner=...)`` loaded per-submodule
(mmtrack/models/vid/base.py:22-37) and split back out by
tools/extract_checkpoints.py. Here checkpoints are orbax pytrees; submodule
extraction is a dict-key slice.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(directory: str, state: Any, step: int = 0) -> str:
    """Save a pytree (TrainState or variables) under directory/step_k."""
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
    else:  # numpy fallback
        import pickle

        os.makedirs(path, exist_ok=True)
        flat = jax.tree_util.tree_map(lambda x: jax.device_get(x), state)
        with open(os.path.join(path, "state.pkl"), "wb") as f:
            pickle.dump(flat, f)
    return path


def _unwrap_train_state(tree: Any) -> Any:
    """A TrainState checkpoint ({params, opt_state, step}) holds the model
    variables under 'params'; a bare variables tree is returned as-is. All
    variable consumers (init_model, tools/test.py, extract_checkpoints) want
    the variables, so load_checkpoint unwraps by default."""
    if isinstance(tree, dict) and "opt_state" in tree and "params" in tree:
        return tree["params"]
    # orbax may restore NamedTuples as dicts keyed by field name; TrainState
    # restored with a target keeps the NamedTuple type
    if hasattr(tree, "opt_state") and hasattr(tree, "params"):
        return tree.params
    return tree


def load_checkpoint(path: str, target: Optional[Any] = None,
                    unwrap: bool = True) -> Any:
    """Restore a checkpoint. With ``unwrap`` (default) a full-TrainState
    checkpoint is reduced to its variables tree — the natural train-then-test
    flow (tools/test.py --checkpoint work_dirs/step_N) then just works.
    Pass ``unwrap=False`` (and usually a ``target``) to restore the full
    optimizer state for resume."""
    if _HAVE_ORBAX and not os.path.exists(os.path.join(path, "state.pkl")):
        ckptr = ocp.StandardCheckpointer()
        restored = (ckptr.restore(path, target) if target is not None
                    else ckptr.restore(path))
    else:
        import pickle

        with open(os.path.join(path, "state.pkl"), "rb") as f:
            restored = pickle.load(f)
    return _unwrap_train_state(restored) if unwrap else restored


def extract_submodule(variables: Dict, submodule: str) -> Dict:
    """tools/extract_checkpoints.py equivalent: slice one submodule's params
    (e.g. 'selsa' or 'cleaner') out of a composite variables tree."""
    out: Dict = {}
    for coll, tree in variables.items():
        if submodule in tree:
            out[coll] = {submodule: tree[submodule]}
    return out


def merge_pretrains(variables: Dict, pretrains: Dict[str, Dict]) -> Dict:
    """Composite warm start: for each (submodule -> variables) entry, replace
    that submodule's subtree (pretrains=dict(detector=..., cleaner=...))."""
    import copy

    out = copy.deepcopy(variables)
    for sub, sub_vars in pretrains.items():
        for coll, tree in sub_vars.items():
            if coll in out and sub in tree:
                out[coll][sub] = tree[sub]
            elif coll in out:
                out[coll][sub] = tree
    return out
