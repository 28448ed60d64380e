"""Config-driven data pipelines (PIPELINES registry)."""

from . import auto_augment, corruptions, formatting, transforms  # noqa: F401 — populate the registry
from .transforms import Compose  # noqa: F401
