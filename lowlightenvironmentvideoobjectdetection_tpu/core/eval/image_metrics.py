"""Image quality metrics: PSNR and (matlab-style) SSIM.

Parity target: mmtrack/core/utils/metrics.py:78 (psnr) / :161 (ssim, the
matlab-gaussian-window variant at L126) — used to monitor denoising quality
in the low-light stack. Pure numpy on host; jnp-compatible shapes.
"""

from __future__ import annotations

import numpy as np


def psnr(img1: np.ndarray, img2: np.ndarray, data_range: float = 255.0) -> float:
    a = np.asarray(img1, np.float64)
    b = np.asarray(img2, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'valid' 2D correlation via stride tricks."""
    kh, kw = kernel.shape
    h, w = img.shape
    sh, sw = img.strides
    windows = np.lib.stride_tricks.as_strided(
        img, (h - kh + 1, w - kw + 1, kh, kw), (sh, sw, sh, sw)
    )
    return np.einsum("ijkl,kl->ij", windows, kernel)


def ssim(img1: np.ndarray, img2: np.ndarray, data_range: float = 255.0) -> float:
    """Matlab-style single-scale SSIM (metrics.py:126): 11x11 gaussian
    window sigma 1.5, K1=.01 K2=.03. Grayscale or per-channel mean."""
    a = np.asarray(img1, np.float64)
    b = np.asarray(img2, np.float64)
    if a.ndim == 3:
        return float(np.mean(
            [ssim(a[..., c], b[..., c], data_range) for c in range(a.shape[-1])]
        ))
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1 = _filter2(a, k)
    mu2 = _filter2(b, k)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2(a * a, k) - mu1_sq
    s2 = _filter2(b * b, k) - mu2_sq
    s12 = _filter2(a * b, k) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return float(np.mean(m))
