"""Result visualization: detection overlays and track drawing.

Parity targets: mmtrack/core/utils/visualization.py:20-167 (imshow_tracks
cv2 backend), BaseVideoDetector.show_result (models/vid/base.py:243-326),
plot_noise_clean_pairs (visualization.py:168). cv2-based, host-side.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import numpy as np


def _color(seed: int):
    rng = random.Random(seed)
    return tuple(rng.randint(0, 255) for _ in range(3))


def imshow_dets(
    img: np.ndarray,
    bboxes: np.ndarray,
    labels: np.ndarray,
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.3,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Draw detections on an image (show_result equivalent)."""
    import cv2

    out = np.ascontiguousarray(np.asarray(img, np.uint8))
    for i, box in enumerate(np.asarray(bboxes).reshape(-1, 4)):
        s = float(scores[i]) if scores is not None else 1.0
        if s < score_thr:
            continue
        lab = int(labels[i])
        x1, y1, x2, y2 = (int(v) for v in box)
        c = _color(lab)
        cv2.rectangle(out, (x1, y1), (x2, y2), c, 2)
        name = (class_names[lab] if class_names and lab < len(class_names)
                else str(lab))
        cv2.putText(out, f"{name}:{s:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, c, 1)
    if out_file:
        cv2.imwrite(out_file, out)
    return out


def imshow_tracks(
    img: np.ndarray,
    track_bboxes: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.0,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Draw tracked boxes colored by identity (imshow_tracks L20-167):
    track_bboxes [N, 6] = (id, x1, y1, x2, y2, score)."""
    import cv2

    out = np.ascontiguousarray(np.asarray(img, np.uint8))
    for row in np.asarray(track_bboxes).reshape(-1, 6):
        tid, x1, y1, x2, y2, s = row
        if s < score_thr:
            continue
        c = _color(int(tid))
        cv2.rectangle(out, (int(x1), int(y1)), (int(x2), int(y2)), c, 2)
        cv2.putText(out, f"#{int(tid)}", (int(x1), max(int(y1) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1)
    if out_file:
        cv2.imwrite(out_file, out)
    return out


def plot_noise_clean_pairs(pair_img: np.ndarray,
                           out_file: Optional[str] = None) -> np.ndarray:
    """Side-by-side view of a (noise, clean) 6ch pair
    (visualization.py:168)."""
    import cv2

    noisy = np.asarray(pair_img[..., :3], np.float32)
    clean = np.asarray(pair_img[..., 3:6], np.float32)

    def to_u8(x):
        lo, hi = float(x.min()), float(x.max())
        return ((x - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)

    canvas = np.concatenate([to_u8(noisy), to_u8(clean)], axis=1)
    if out_file:
        cv2.imwrite(out_file, canvas)
    return canvas
