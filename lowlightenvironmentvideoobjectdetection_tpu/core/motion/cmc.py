"""Camera motion compensation.

Parity target: mmtrack/models/motion/camera_motion_compensation.py:9-75 —
estimate a warp matrix between consecutive frames (cv2 ECC) and warp the
previous frame's track boxes into the current frame. Host-side (the tracking
loop is sequential); the detector runs on the TPU meanwhile.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class CameraMotionCompensation:
    def __init__(self, warp_mode: str = "euclidean",
                 num_iters: int = 50, stop_eps: float = 0.001):
        self.warp_mode = warp_mode
        self.num_iters = num_iters
        self.stop_eps = stop_eps

    def get_warp_matrix(self, img: np.ndarray, ref_img: np.ndarray) -> np.ndarray:
        """ECC warp from ref_img -> img (both HWC uint8/float BGR)."""
        import cv2

        mode = {"translation": cv2.MOTION_TRANSLATION,
                "euclidean": cv2.MOTION_EUCLIDEAN,
                "affine": cv2.MOTION_AFFINE}[self.warp_mode]
        g1 = cv2.cvtColor(np.asarray(ref_img, np.uint8), cv2.COLOR_BGR2GRAY)
        g2 = cv2.cvtColor(np.asarray(img, np.uint8), cv2.COLOR_BGR2GRAY)
        # gaussian pre-smoothing: ECC's gradient-based iteration diverges on
        # high-frequency (noisy) content without it
        g1 = cv2.GaussianBlur(g1, (5, 5), 1.5)
        g2 = cv2.GaussianBlur(g2, (5, 5), 1.5)
        warp = np.eye(2, 3, dtype=np.float32)
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                    self.num_iters, self.stop_eps)
        try:
            _, warp = cv2.findTransformECC(g1, g2, warp, mode, criteria)
        except cv2.error:  # flat/low-texture frames: identity
            warp = np.eye(2, 3, dtype=np.float32)
        return warp

    def warp_bboxes(self, bboxes: np.ndarray, warp: np.ndarray) -> np.ndarray:
        """Apply the 2x3 warp to xyxy boxes (L26-51)."""
        if len(bboxes) == 0:
            return bboxes
        b = np.asarray(bboxes, np.float32)
        p1 = np.concatenate([b[:, :2], np.ones((len(b), 1), np.float32)], 1)
        p2 = np.concatenate([b[:, 2:4], np.ones((len(b), 1), np.float32)], 1)
        w1 = p1 @ warp.T
        w2 = p2 @ warp.T
        return np.concatenate([w1[:, :2], w2[:, :2]], axis=1)

    def track(self, img: np.ndarray, ref_img: np.ndarray,
              bboxes: np.ndarray) -> np.ndarray:
        return self.warp_bboxes(bboxes, self.get_warp_matrix(img, ref_img))
