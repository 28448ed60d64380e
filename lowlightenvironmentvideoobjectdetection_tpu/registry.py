"""Registry + config-driven model construction.

Parity target: the mmcv Registry/build_from_cfg pattern that forms the
reference's de-facto public API (mmtrack/models/builder.py:5-10 defines
MODELS/TRACKERS/MOTION/REID/AGGREGATORS/CLEANER; mmdet adds DETECTORS,
BACKBONES, NECKS, HEADS, DATASETS, PIPELINES): a new model is a config dict
with a ``type`` key naming a registered class.

Here a registry maps type names to *factory callables* that return the
framework's functional building blocks (flax modules / dataclass systems).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Callable] = {}

    def register(self, name: Optional[str] = None, force: bool = False):
        def deco(fn):
            key = name or fn.__name__
            if key in self._registry and not force:
                raise KeyError(f"{key} already registered in {self.name}")
            self._registry[key] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._registry:
            raise KeyError(
                f"{name!r} is not registered in {self.name}; "
                f"known: {sorted(self._registry)}"
            )
        return self._registry[name]

    def build(self, cfg: Dict[str, Any], **extra):
        cfg = dict(cfg)
        type_name = cfg.pop("type")
        return self.get(type_name)(**cfg, **extra)

    def __contains__(self, name: str) -> bool:
        return name in self._registry

    def keys(self):
        return self._registry.keys()


MODELS = Registry("models")
DETECTORS = Registry("detectors")
BACKBONES = Registry("backbones")
NECKS = Registry("necks")
HEADS = Registry("heads")
AGGREGATORS = Registry("aggregators")
CLEANERS = Registry("cleaners")
MOTION = Registry("motion")
TRACKERS = Registry("trackers")
REID = Registry("reid")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
LOSSES = Registry("losses")


def build_model(cfg: Dict[str, Any], **extra):
    """mmtrack ``build_model`` equivalent: dispatch on cfg['type'] over the
    top-level MODELS registry."""
    return MODELS.build(cfg, **extra)
