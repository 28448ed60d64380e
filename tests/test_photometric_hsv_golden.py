"""HSV color math goldens for the exact PhotoMetricDistortion
(mmtrack/datasets/pipelines/transforms.py:797-954 uses mmcv/cv2 float
BGR<->HSV). Cross-checked against matplotlib's independent rgb<->hsv
implementation and by roundtrip/identity properties.
"""

import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.data.pipelines.transforms import (
    PhotoMetricDistortion, bgr2hsv, hsv2bgr)


def test_bgr2hsv_matches_matplotlib():
    mcolors = pytest.importorskip("matplotlib.colors")
    rng = np.random.RandomState(0)
    rgb = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    bgr = rgb[..., ::-1]

    got = bgr2hsv(bgr)
    want = mcolors.rgb_to_hsv(rgb / 255.0)  # h, s in [0,1]; v in [0,1]
    np.testing.assert_allclose(got[..., 0], want[..., 0] * 360.0,
                               atol=2e-3)
    np.testing.assert_allclose(got[..., 1], want[..., 1], atol=1e-5)
    np.testing.assert_allclose(got[..., 2], want[..., 2] * 255.0, atol=1e-3)


def test_hsv2bgr_matches_matplotlib():
    mcolors = pytest.importorskip("matplotlib.colors")
    rng = np.random.RandomState(1)
    hsv = np.stack([
        rng.uniform(0, 360, (32, 32)),
        rng.uniform(0, 1, (32, 32)),
        rng.uniform(0, 255, (32, 32)),
    ], -1).astype(np.float32)
    got = hsv2bgr(hsv)
    want_rgb = mcolors.hsv_to_rgb(
        np.stack([hsv[..., 0] / 360.0, hsv[..., 1], hsv[..., 2] / 255.0], -1))
    np.testing.assert_allclose(got[..., ::-1], want_rgb * 255.0, atol=2e-3)


def test_roundtrip_identity():
    rng = np.random.RandomState(2)
    bgr = rng.uniform(0, 255, (40, 40, 3)).astype(np.float32)
    np.testing.assert_allclose(hsv2bgr(bgr2hsv(bgr)), bgr, atol=1e-2)


def test_identity_params_are_noop_and_hue_wraps():
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    t = PhotoMetricDistortion()
    p = dict(delta=None, contrast_first=True, alpha=None, saturation=None,
             hue=None, permutation=None)
    out = t.apply({"img": img.copy(), "img_fields": ["img"]}, p)["img"]
    np.testing.assert_allclose(out, img, atol=1e-4)

    # hue += 360-equivalent rotations cancel: +18 then -18
    p1 = dict(p, hue=18.0)
    p2 = dict(p, hue=-18.0)
    once = t.apply({"img": img.copy(), "img_fields": ["img"]}, p1)["img"]
    back = t.apply({"img": once, "img_fields": ["img"]}, p2)["img"]
    np.testing.assert_allclose(back, img, atol=5e-2)


def test_pair_6ch_shares_params_across_groups():
    rng = np.random.RandomState(4)
    a = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    pair = np.concatenate([a, a], -1)
    t = PhotoMetricDistortion()
    p = dict(delta=10.0, contrast_first=False, alpha=1.2, saturation=1.3,
             hue=9.0, permutation=(2, 0, 1))
    out = t.apply({"img": pair, "img_fields": ["img"]}, p)["img"]
    assert out.shape == (8, 8, 6)
    np.testing.assert_allclose(out[..., :3], out[..., 3:], atol=1e-5)
    single = t.apply({"img": a.copy(), "img_fields": ["img"]}, p)["img"]
    np.testing.assert_allclose(out[..., :3], single, atol=1e-5)
