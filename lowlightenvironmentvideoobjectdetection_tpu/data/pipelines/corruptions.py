"""Image-corruption transform for robustness benchmarking.

Parity target: mmdetection/mmdet/datasets/pipelines/transforms.py:1146
``Corrupt`` — the reference delegates to the external ``imagecorruptions``
pip package (gated import, transforms.py:13-15). Here the benchmark's core
corruption families are implemented natively (numpy/cv2), so the robustness
benchmark runs without an extra dependency: noise (gaussian/shot/impulse),
blur (defocus/motion), weather-ish (brightness/contrast/fog), and digital
(pixelate/jpeg). Severity 1-5 follows the benchmark's convention of
increasing intensity.
"""

from __future__ import annotations

import numpy as np

from ...registry import PIPELINES


def _gaussian_noise(img, sev):
    c = [0.04, 0.06, 0.08, 0.09, 0.10][sev - 1] * 255
    return img + np.random.normal(size=img.shape) * c


def _shot_noise(img, sev):
    c = [500, 250, 100, 75, 50][sev - 1]
    x = np.clip(img / 255.0, 0, 1)
    return np.random.poisson(x * c) / c * 255.0


def _impulse_noise(img, sev):
    c = [0.01, 0.02, 0.03, 0.05, 0.07][sev - 1]
    mask = np.random.rand(*img.shape[:2]) < c
    salt = np.random.rand(*img.shape[:2]) < 0.5
    out = img.copy()
    out[mask & salt] = 255.0
    out[mask & ~salt] = 0.0
    return out


def _defocus_blur(img, sev):
    import cv2

    k = [3, 5, 7, 9, 11][sev - 1]
    return cv2.blur(img.astype(np.float32), (k, k))


def _motion_blur(img, sev):
    import cv2

    k = [5, 7, 9, 13, 17][sev - 1]
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0 / k
    return cv2.filter2D(img.astype(np.float32), -1, kernel)


def _brightness(img, sev):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][sev - 1]
    return img + c * 255.0


def _contrast(img, sev):
    c = [0.75, 0.6, 0.45, 0.3, 0.15][sev - 1]
    mean = img.mean(axis=(0, 1), keepdims=True)
    return (img - mean) * c + mean


def _fog(img, sev):
    c = [0.1, 0.2, 0.3, 0.45, 0.6][sev - 1]
    return img * (1 - c) + 255.0 * c


def _pixelate(img, sev):
    import cv2

    c = [0.6, 0.5, 0.4, 0.3, 0.25][sev - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def _jpeg(img, sev):
    import cv2

    q = [80, 65, 50, 35, 20][sev - 1]
    ok, enc = cv2.imencode(".jpg", np.clip(img, 0, 255).astype(np.uint8),
                           [int(cv2.IMWRITE_JPEG_QUALITY), q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32)


CORRUPTIONS = {
    "gaussian_noise": _gaussian_noise,
    "shot_noise": _shot_noise,
    "impulse_noise": _impulse_noise,
    "defocus_blur": _defocus_blur,
    "motion_blur": _motion_blur,
    "brightness": _brightness,
    "contrast": _contrast,
    "fog": _fog,
    "pixelate": _pixelate,
    "jpeg_compression": _jpeg,
}


@PIPELINES.register("Corrupt")
class Corrupt:
    def __init__(self, corruption: str, severity: int = 1):
        if corruption not in CORRUPTIONS:
            raise KeyError(
                f"unknown corruption '{corruption}'; "
                f"known: {sorted(CORRUPTIONS)}")
        assert 1 <= severity <= 5
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        img = np.asarray(results["img"], np.float32)
        out = CORRUPTIONS[self.corruption](img, self.severity)
        results["img"] = np.clip(out, 0, 255).astype(np.float32)
        return results
