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


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    if _HAVE_ORBAX and not os.path.exists(os.path.join(path, "state.pkl")):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target) if target is not None else ckptr.restore(path)
    import pickle

    with open(os.path.join(path, "state.pkl"), "rb") as f:
        return pickle.load(f)


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
