"""LLVOD-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video object detection framework.

Re-designed from scratch with the capability surface of
DabinGreat/LowLightEnvironmentVideoObjectDetection (mmtracking 0.5 + mmdetection
2.10 fork for low-light video object detection), built TPU-first:

- Functional models (flax.linen) with parameters as pytrees.
- One compiled step function per workload: ``pjit``-sharded training steps and
  state-carrying streaming-inference steps (the reference's mutable ``self.memo``
  becomes an explicit scan carry).
- Static shapes everywhere: padded images, fixed proposal counts, masked
  assigners/samplers, on-device fixed-size NMS.
- Pallas kernels for the hot gather ops (RoIAlign et al.); XLA for the rest.
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
