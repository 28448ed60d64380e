"""AutoAugment-style detection augmentations.

Parity target: mmdetection/mmdet/datasets/pipelines/auto_augment.py —
``AutoAugment`` (random policy container, :46), ``Shear`` (:112),
``Rotate`` (:329), ``Translate`` (:543), ``ColorTransform`` (:709),
``EqualizeTransform`` (:758), ``BrightnessTransform`` (:797),
``ContrastTransform`` (:846). Geometric ops warp both the image and the
bbox fields (corner-point transform, then re-axis-align + clip, as the
reference does); color ops are image-only. ``InstaBoost`` is a gated stub —
the reference too requires the external ``instaboostfast`` pip package
(instaboost.py:31), which is not vendored here either.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ...registry import PIPELINES


def _warp_boxes(boxes: np.ndarray, mat: np.ndarray, h: int, w: int):
    """Affine-transform boxes by 2x3 ``mat``; re-axis-align and clip."""
    if boxes.size == 0:
        return boxes
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]],
    ], axis=1)  # [N, 4, 2]
    ones = np.ones((*corners.shape[:2], 1), np.float32)
    pts = np.concatenate([corners, ones], axis=-1) @ mat.T  # [N, 4, 2]
    out = np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1)
    out[:, 0::2] = out[:, 0::2].clip(0, w)
    out[:, 1::2] = out[:, 1::2].clip(0, h)
    return out.astype(np.float32)


class _GeometricBase:
    def _apply(self, results, mat):
        import cv2

        h, w = results["img"].shape[:2]
        for key in results.get("img_fields", ["img"]):
            results[key] = cv2.warpAffine(
                results[key], mat, (w, h),
                borderValue=tuple(self.img_fill_val))
        for key in results.get("bbox_fields", ["gt_bboxes"]):
            if key in results:
                results[key] = _warp_boxes(results[key], mat, h, w)
        return results


@PIPELINES.register("Shear")
class Shear(_GeometricBase):
    def __init__(self, level: float = 5.0, img_fill_val=(128, 128, 128),
                 prob: float = 0.5, direction: str = "horizontal",
                 max_shear_magnitude: float = 0.3, random_negative_prob=0.5,
                 **kw):
        self.magnitude = level / 10.0 * max_shear_magnitude
        self.img_fill_val = img_fill_val
        self.prob = prob
        self.direction = direction
        self.random_negative_prob = random_negative_prob

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        m = self.magnitude
        if np.random.rand() < self.random_negative_prob:
            m = -m
        if self.direction == "horizontal":
            mat = np.float32([[1, m, 0], [0, 1, 0]])
        else:
            mat = np.float32([[1, 0, 0], [m, 1, 0]])
        return self._apply(results, mat)


@PIPELINES.register("Rotate")
class Rotate(_GeometricBase):
    def __init__(self, level: float = 5.0, scale: float = 1.0,
                 img_fill_val=(128, 128, 128), prob: float = 0.5,
                 max_rotate_angle: float = 30.0, random_negative_prob=0.5,
                 **kw):
        self.angle = level / 10.0 * max_rotate_angle
        self.scale = scale
        self.img_fill_val = img_fill_val
        self.prob = prob
        self.random_negative_prob = random_negative_prob

    def __call__(self, results):
        import cv2

        if np.random.rand() > self.prob:
            return results
        a = self.angle
        if np.random.rand() < self.random_negative_prob:
            a = -a
        h, w = results["img"].shape[:2]
        mat = cv2.getRotationMatrix2D(((w - 1) * 0.5, (h - 1) * 0.5), a,
                                      self.scale).astype(np.float32)
        return self._apply(results, mat)


@PIPELINES.register("Translate")
class Translate(_GeometricBase):
    def __init__(self, level: float = 5.0, prob: float = 0.5,
                 img_fill_val=(128, 128, 128), direction: str = "horizontal",
                 max_translate_offset: float = 250.0,
                 random_negative_prob=0.5, **kw):
        self.offset = int(level / 10.0 * max_translate_offset)
        self.prob = prob
        self.img_fill_val = img_fill_val
        self.direction = direction
        self.random_negative_prob = random_negative_prob

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        off = self.offset
        if np.random.rand() < self.random_negative_prob:
            off = -off
        if self.direction == "horizontal":
            mat = np.float32([[1, 0, off], [0, 1, 0]])
        else:
            mat = np.float32([[1, 0, 0], [0, 1, off]])
        return self._apply(results, mat)


@PIPELINES.register("ColorTransform")
class ColorTransform:
    """Blend with the grayscale image (PIL Color semantics)."""

    def __init__(self, level: float = 5.0, prob: float = 0.5, **kw):
        self.factor = 1.0 + level / 10.0 * 1.8 - 0.9  # mmdet enhance factor
        self.prob = prob

    def _enhance(self, img, degenerate):
        f = self.factor
        out = degenerate.astype(np.float32) * (1 - f) + \
            img.astype(np.float32) * f
        return np.clip(out, 0, 255).astype(img.dtype)

    def __call__(self, results):
        import cv2

        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_BGR2GRAY)
        degenerate = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
        results["img"] = self._enhance(img, degenerate)
        return results


@PIPELINES.register("EqualizeTransform")
class EqualizeTransform:
    def __init__(self, prob: float = 0.5, **kw):
        self.prob = prob

    def __call__(self, results):
        import cv2

        if np.random.rand() > self.prob:
            return results
        img = results["img"].astype(np.uint8)
        chans = [cv2.equalizeHist(img[..., c]) for c in range(img.shape[-1])]
        results["img"] = np.stack(chans, axis=-1).astype(results["img"].dtype)
        return results


@PIPELINES.register("BrightnessTransform")
class BrightnessTransform(ColorTransform):
    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        results["img"] = self._enhance(img, np.zeros_like(img))
        return results


@PIPELINES.register("ContrastTransform")
class ContrastTransform(ColorTransform):
    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        img = results["img"]
        mean = np.full_like(img, int(img.astype(np.float32).mean()))
        results["img"] = self._enhance(img, mean)
        return results


@PIPELINES.register("AutoAugment")
class AutoAugment:
    """Randomly pick ONE policy (a sub-pipeline of transform cfgs) per call
    (auto_augment.py:46-109)."""

    def __init__(self, policies: Sequence[Sequence[dict]]):
        self.policies: List[List] = [
            [PIPELINES.get(dict(t).pop("type"))(**{k: v for k, v in t.items() if k != "type"}) for t in policy]
            for policy in policies
        ]

    def __call__(self, results):
        policy = self.policies[np.random.randint(len(self.policies))]
        for t in policy:
            results = t(results)
        return results


@PIPELINES.register("InstaBoost")
class InstaBoost:
    """Gated stub: like the reference (instaboost.py:31), this augmentation
    requires the external ``instaboostfast`` package, which is not part of
    either codebase's vendored dependencies."""

    def __init__(self, **kw):
        raise ImportError(
            "InstaBoost requires the 'instaboostfast' package (not bundled; "
            "the reference imports it from pip at the same point)")
