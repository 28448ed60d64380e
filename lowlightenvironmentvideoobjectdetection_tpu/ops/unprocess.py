"""sRGB -> RAW 'unprocessing' (Brooks et al.) for RAW-domain training.

Parity target: mmtracking/mmtrack/datasets/pipelines/transforms.py:958-1110
(sRGB2RAW / SeqsRGB2RAW): random convex-combination CCM, random WB gains,
inverse tone mapping, gamma de-compression, and RGGB 'demosaic' to 4
channels, with ccm/gains shared across the frames of a clip.

Implemented in pure jnp so the whole conversion fuses on device with the
noise synthesis; parameters come from an explicit PRNG key.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_XYZ2CAMS = jnp.asarray(
    [
        [[1.0234, -0.2969, -0.2266], [-0.5625, 1.6328, -0.0469],
         [-0.0703, 0.2188, 0.6406]],
        [[0.4913, -0.0541, -0.0202], [-0.613, 1.3513, 0.2906],
         [-0.1564, 0.2151, 0.7183]],
        [[0.838, -0.263, -0.0639], [-0.2887, 1.0725, 0.2496],
         [-0.0627, 0.1427, 0.5438]],
        [[0.6596, -0.2079, -0.0562], [-0.4782, 1.3016, 0.1933],
         [-0.097, 0.1581, 0.5181]],
    ]
)

_RGB2XYZ = jnp.asarray(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)


class CcmGain(NamedTuple):
    rgb2cam: jnp.ndarray  # [3, 3]
    rgb_gain: jnp.ndarray  # []
    red_gain: jnp.ndarray  # []
    blue_gain: jnp.ndarray  # []


def random_ccm_gain(rng) -> CcmGain:
    """Random RGB->camera CCM (convex combination of 4 device CCMs,
    row-normalized) and random brightening/WB gains."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    # log-uniform positive weights as the reference's uniform(1e-8, 1e8)
    weights = jax.random.uniform(r1, (4, 1, 1), minval=1e-8, maxval=1e8)
    xyz2cam = jnp.sum(_XYZ2CAMS * weights, axis=0) / jnp.sum(weights)
    rgb2cam = xyz2cam @ _RGB2XYZ
    rgb2cam = rgb2cam / jnp.sum(rgb2cam, axis=-1, keepdims=True)
    rgb_gain = 1.0 / (0.8 + 0.1 * jax.random.normal(r2))
    red_gain = jax.random.uniform(r3, minval=1.9, maxval=2.4)
    blue_gain = jax.random.uniform(r4, minval=1.5, maxval=1.9)
    return CcmGain(rgb2cam, rgb_gain, red_gain, blue_gain)


def inverse_tone_map(img: jnp.ndarray) -> jnp.ndarray:
    img = jnp.clip(img, 0.0, 1.0)
    return 0.5 - jnp.sin(jnp.arcsin(1.0 - 2.0 * img) / 3.0)


def gamma_decompress(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(img, 1e-8) ** 2.2


def apply_ccm(img: jnp.ndarray, ccm: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...c,dc->...d", img, ccm)


def inverse_white_balance(img: jnp.ndarray, g: CcmGain) -> jnp.ndarray:
    """Applies 1/gains with the saturated-pixel protection mask."""
    gains = jnp.stack([1.0 / g.red_gain, 1.0, 1.0 / g.blue_gain]) / g.rgb_gain
    gray = jnp.mean(img, axis=-1, keepdims=True)
    inflection = 0.9
    mask = (jnp.maximum(gray - inflection, 0.0) / (1.0 - inflection)) ** 2.0
    safe_gain = jnp.maximum(mask + (1.0 - mask) * gains, gains)
    return img * safe_gain


def mosaic_rggb(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB -> [..., 4] (R, G, G, B) plane stack, the reference's
    '_demosaicing' (transforms.py:1044)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return jnp.stack([r, g, g, b], axis=-1)


def srgb_to_raw(
    img_rgb01: jnp.ndarray,
    ccm_gain: CcmGain,
    tone_mapping: bool = False,
    gamma_compression: bool = False,
    color_correction: bool = False,
    white_balance: bool = False,
    demosaicing: bool = True,
) -> jnp.ndarray:
    """img_rgb01: [..., H, W, 3] in [0, 1]. Flags mirror the transform cfg."""
    img = img_rgb01
    if tone_mapping:
        img = inverse_tone_map(img)
    if gamma_compression:
        img = gamma_decompress(img)
    if color_correction:
        img = apply_ccm(img, ccm_gain.rgb2cam)
    if white_balance:
        img = jnp.clip(inverse_white_balance(img, ccm_gain), 0.0, 1.0)
    if demosaicing:
        img = mosaic_rggb(img)
    return img


def seq_srgb_to_raw(rng, clip_rgb01: jnp.ndarray, **flags) -> Tuple[jnp.ndarray, CcmGain]:
    """Clip version with shared ccm/gains across frames (SeqsRGB2RAW)."""
    g = random_ccm_gain(rng)
    return srgb_to_raw(clip_rgb01, g, **flags), g
