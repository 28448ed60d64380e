"""Python-file config system with ``_base_`` inheritance.

Parity target: mmcv ``Config.fromfile`` as used throughout the reference
(e.g. configs/vid/selsa/selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py:1-5):
python files executed as dicts, ``_base_`` list composition with deep merge,
``_delete_=True`` to replace instead of merge, and dotted-key CLI overrides
(tools/train.py ``--cfg-options``).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional


class Config(dict):
    """Attribute-accessible nested dict."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def _wrap(obj):
        if isinstance(obj, dict) and not isinstance(obj, Config):
            return Config({k: Config._wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config._wrap(v) for v in obj]
        return obj

    @staticmethod
    def fromfile(path: str) -> "Config":
        return Config._wrap(load_config(path))


def _exec_config_file(path: str) -> Dict[str, Any]:
    with open(path) as f:
        code = f.read()
    ns: Dict[str, Any] = {"__file__": path, "os": os}
    exec(compile(code, path, "exec"), ns)
    return {
        k: v
        for k, v in ns.items()
        if not k.startswith("__") and k != "os" and not callable(v)
    }


def deep_merge(base: Dict, override: Dict) -> Dict:
    """mmcv-style merge: dicts merge recursively; ``_delete_=True`` in the
    override replaces the base subtree; non-dict values overwrite."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k == "_delete_":
            continue
        if (
            isinstance(v, dict)
            and isinstance(out.get(k), dict)
            and not v.get("_delete_", False)
        ):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
            if isinstance(out[k], dict):
                out[k].pop("_delete_", None)
    return out


def load_config(path: str) -> Dict[str, Any]:
    cfg = _exec_config_file(path)
    bases = cfg.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        base_path = os.path.join(os.path.dirname(path), b)
        merged = deep_merge(merged, load_config(base_path))
    return deep_merge(merged, cfg)


def apply_cli_options(cfg: Dict, options: Optional[List[str]]) -> Dict:
    """Apply ``key.subkey=value`` overrides (tools/train.py --cfg-options)."""
    if not options:
        return cfg
    for opt in options:
        key, _, raw = opt.partition("=")
        try:
            value = eval(raw, {}, {})  # literals: ints, floats, tuples, bools
        except Exception:
            value = raw
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg
