"""Anchor generation.

Behavior parity with the reference's ``AnchorGenerator``
(mmdetection/mmdet/core/anchor/anchor_generator.py:10-230): scale-major base
anchors centered at ``center_offset * stride`` (default 0), grid anchors laid
out row-major with per-cell base anchors contiguous.

Anchors are computed once at model-build time (static shapes) and baked into
the compiled graph as constants — there is no per-step anchor kernel, which is
the TPU-idiomatic replacement for the reference's cached ``grid_anchors``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class AnchorGenerator:
    """Multi-level grid anchor generator (host-side numpy; outputs are consts).

    Args mirror the reference config surface: ``strides`` per level, shared
    ``ratios``/``scales`` (or retina-style octave args), ``center_offset``.
    """

    strides: Sequence[int]
    ratios: Sequence[float]
    scales: Optional[Sequence[float]] = None
    base_sizes: Optional[Sequence[int]] = None
    octave_base_scale: Optional[int] = None
    scales_per_octave: Optional[int] = None
    center_offset: float = 0.0

    def __post_init__(self):
        if self.scales is None:
            assert self.octave_base_scale and self.scales_per_octave
        else:
            assert self.octave_base_scale is None

    @property
    def _scales(self) -> np.ndarray:
        if self.scales is not None:
            return np.asarray(self.scales, np.float32)
        octave = np.array(
            [2 ** (i / self.scales_per_octave) for i in range(self.scales_per_octave)],
            np.float32,
        )
        return octave * self.octave_base_scale

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * len(self._scales)

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def base_anchors(self, level: int) -> np.ndarray:
        """[A, 4] base anchors for one level, scale-major ordering."""
        base_size = (
            self.base_sizes[level] if self.base_sizes is not None else self.strides[level]
        )
        w = h = float(base_size)
        x_center = self.center_offset * w
        y_center = self.center_offset * h
        ratios = np.asarray(self.ratios, np.float32)
        scales = self._scales
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        # scale-major: same row -> same ratio, scales vary fastest.
        ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        return np.stack(
            [x_center - 0.5 * ws, y_center - 0.5 * hs, x_center + 0.5 * ws, y_center + 0.5 * hs],
            axis=-1,
        )

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """Per-level [H*W*A, 4] anchors; per-cell anchors contiguous, row-major."""
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            stride = self.strides[lvl]
            base = self.base_anchors(lvl)  # [A, 4]
            shift_x = np.arange(fw, dtype=np.float32) * stride
            shift_y = np.arange(fh, dtype=np.float32) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=-1)
            anchors = base[None, :, :] + shifts[:, None, :]
            out.append(anchors.reshape(-1, 4).astype(np.float32))
        return out

    def valid_flags(
        self,
        featmap_sizes: Sequence[Tuple[int, int]],
        pad_shape: Tuple[int, int],
    ) -> List[np.ndarray]:
        """Per-level [H*W*A] bool flags — anchor centers inside the valid
        (un-padded) image region, as the reference's ``valid_flags``."""
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            stride = self.strides[lvl]
            vh = min(int(np.ceil(pad_shape[0] / stride)), fh)
            vw = min(int(np.ceil(pad_shape[1] / stride)), fw)
            vx = np.zeros(fw, bool)
            vy = np.zeros(fh, bool)
            vx[:vw] = True
            vy[:vh] = True
            grid = (vy[:, None] & vx[None, :]).ravel()
            out.append(np.repeat(grid, self.num_base_anchors))
        return out
