"""Config-driven data pipeline: loading, geometric/photometric transforms,
low-light pair handling, SOT augmentations.

Parity targets (mmtracking/mmtrack/datasets/pipelines/):
- loading.py: LoadMultiImagesFromFile (L14), LoadImagePairsFromFile
  (L45-94: loads the noisy frame + sibling ``GT/`` clean frame and concats to
  6ch), LoadMutiImagePairsFromFile (L98), SeqLoadAnnotations (L124),
  LoadDetections (L177).
- transforms.py: SeqResize (L332), SeqRandomFlip (L556), SeqPad (L618),
  SeqRandomCrop (L650), SeqPhotoMetricDistortion (L797), Brighten/SeqBrighten
  (L374/412: amplify a dark image so its mean ≈ m; amp computed on the noisy
  half of a 6ch pair and shared across frames), NormalizePairs/SeqNormalize
  (L434/481: normalize both halves of a 6ch pair), NormalizeRAW/
  SeqNormalizeRAW (L513/542: 8ch RGGB pairs), sRGB2RAW/SeqsRGB2RAW
  (L958/1110: unprocessing with frame-shared CCM/gains), AddNoise/SeqAddNoise
  (L1133/1254: output = 2xC concat of noise+clean), SOT augs SeqCropLikeSiamFC
  (L16), SeqShiftScaleAug (L142), SeqColorAug (L238), SeqBlurAug (L288).
- processing.py: MatchInstances (L6).

Design: transforms operate on host numpy ``results`` dicts (one per frame);
``Seq*`` variants map over a list of dicts sharing random parameters. Heavy
photometric math (noise synthesis, unprocessing) delegates to the on-device
``ops.noise`` / ``ops.unprocess`` implementations — the same functions the
compiled training prologue uses — executed on the host backend here.
"""

from __future__ import annotations

import os
import random as pyrandom
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ...registry import PIPELINES

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


class Compose:
    """Chain of transforms; each is a callable or a ``dict(type=...)`` built
    from the PIPELINES registry."""

    def __init__(self, transforms: Sequence):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                cfg = dict(t)
                t = PIPELINES.get(cfg.pop("type"))(**cfg)
            self.transforms.append(t)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


class _SeqMixin:
    """Applies the single-sample ``__call__`` over a list of result dicts."""

    def __call__(self, results):
        if isinstance(results, dict):
            return self.transform(results)
        return [self.transform(r) for r in results]

    def transform(self, results):  # pragma: no cover - overridden
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------


def _imread(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img  # BGR uint8, like the reference (mmcv.imread default)


@PIPELINES.register("LoadImageFromFile")
class LoadImageFromFile(_SeqMixin):
    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def transform(self, results):
        info = results["img_info"]
        path = os.path.join(results.get("img_prefix", ""),
                            info.get("filename") or info["file_name"])
        img = _imread(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results["img"] = img
        results["img_shape"] = img.shape[:2]
        results["ori_shape"] = img.shape[:2]
        results.setdefault("img_fields", ["img"])
        return results


@PIPELINES.register("LoadMultiImagesFromFile")
class LoadMultiImagesFromFile(LoadImageFromFile):
    pass  # _SeqMixin already maps over list inputs


def _gt_sibling_path(path: str) -> str:
    """The reference's path surgery (loading.py:66-73): the clean frame lives
    in a sibling ``GT/`` directory next to the noisy frame's parent dir."""
    d, fname = os.path.split(path)
    parent, sub = os.path.split(d)
    return os.path.join(parent, "GT", fname)


@PIPELINES.register("LoadImagePairsFromFile")
class LoadImagePairsFromFile(_SeqMixin):
    """Loads the noisy frame and its sibling clean (GT) frame, concatenated
    channel-wise to 6ch (loading.py:45-94)."""

    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def transform(self, results):
        info = results["img_info"]
        path = os.path.join(results.get("img_prefix", ""),
                            info.get("filename") or info["file_name"])
        noisy = _imread(path)
        clean = _imread(_gt_sibling_path(path))
        img = np.concatenate([noisy, clean], axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        results["img"] = img
        results["img_shape"] = img.shape[:2]
        results["ori_shape"] = img.shape[:2]
        results.setdefault("img_fields", ["img"])
        return results


@PIPELINES.register("LoadMutiImagePairsFromFile")  # reference's typo'd name
@PIPELINES.register("LoadMultiImagePairsFromFile")
class LoadMultiImagePairsFromFile(LoadImagePairsFromFile):
    pass


@PIPELINES.register("SeqLoadAnnotations")
@PIPELINES.register("LoadAnnotations")
class SeqLoadAnnotations(_SeqMixin):
    """Copies parsed annotations (from the dataset) into the results dict,
    including instance ids (loading.py:124)."""

    def __init__(self, with_bbox: bool = True, with_ins_id: bool = True):
        self.with_bbox = with_bbox
        self.with_ins_id = with_ins_id

    def transform(self, results):
        ann = results.get("ann", {})
        if self.with_bbox:
            results["gt_bboxes"] = np.asarray(
                ann.get("bboxes", np.zeros((0, 4))), np.float32
            )
            results.setdefault("bbox_fields", []).append("gt_bboxes")
            results["gt_labels"] = np.asarray(ann.get("labels", []), np.int64)
        if self.with_ins_id:
            results["gt_instance_ids"] = np.asarray(
                ann.get("instance_ids", []), np.int64
            )
        return results


@PIPELINES.register("LoadDetections")
class LoadDetections(_SeqMixin):
    """Moves precomputed public detections into the results dict
    (loading.py:177) — used by MOT with public detections."""

    def transform(self, results):
        dets = np.asarray(results["detections"], np.float32)
        results["public_bboxes"] = dets[:, :4]
        if dets.shape[1] > 4:
            results["public_scores"] = dets[:, 4]
        if dets.shape[1] > 5:
            results["public_labels"] = dets[:, 5].astype(np.int64)
        return results


# ---------------------------------------------------------------------------
# Geometric transforms
# ---------------------------------------------------------------------------


@PIPELINES.register("Resize")
class Resize:
    """Keep-ratio resize to fit within ``img_scale=(w, h)`` (mmdet
    semantics); rescales bboxes and records ``scale_factor``."""

    def __init__(self, img_scale: Tuple[int, int] = (1000, 600),
                 keep_ratio: bool = True):
        self.img_scale = img_scale
        self.keep_ratio = keep_ratio

    def _scale(self, h, w):
        max_l, min_l = max(self.img_scale), min(self.img_scale)
        if self.keep_ratio:
            s = min(max_l / max(h, w), min_l / min(h, w))
            return s, s
        return self.img_scale[1] / h, self.img_scale[0] / w

    def __call__(self, results):
        import cv2

        sh, sw = None, None
        for key in results.get("img_fields", ["img"]):
            img = results[key]
            h, w = img.shape[:2]
            sy, sx = self._scale(h, w)
            nh, nw = int(h * sy + 0.5), int(w * sx + 0.5)
            results[key] = cv2.resize(img, (nw, nh),
                                      interpolation=cv2.INTER_LINEAR)
            sh, sw = nh / h, nw / w
        results["img_shape"] = results["img"].shape[:2]
        results["scale_factor"] = np.array([sw, sh, sw, sh], np.float32)
        for key in results.get("bbox_fields", []):
            results[key] = results[key] * results["scale_factor"]
        return results


@PIPELINES.register("SeqResize")
class SeqResize(Resize):
    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        return [super(SeqResize, self).__call__(r) for r in results]


@PIPELINES.register("RandomFlip")
class RandomFlip:
    def __init__(self, flip_ratio: float = 0.5):
        self.flip_ratio = flip_ratio

    def apply(self, results, flip: bool):
        results["flip"] = flip
        if not flip:
            return results
        for key in results.get("img_fields", ["img"]):
            results[key] = np.ascontiguousarray(results[key][:, ::-1])
        w = results["img_shape"][1]
        for key in results.get("bbox_fields", []):
            b = results[key].copy()
            b[:, 0] = w - results[key][:, 2]
            b[:, 2] = w - results[key][:, 0]
            results[key] = b
        return results

    def __call__(self, results):
        return self.apply(results, pyrandom.random() < self.flip_ratio)


@PIPELINES.register("SeqRandomFlip")
class SeqRandomFlip(RandomFlip):
    """share_params=True: one coin flip for the whole clip."""

    def __init__(self, share_params: bool = True, flip_ratio: float = 0.5):
        super().__init__(flip_ratio)
        self.share_params = share_params

    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        if self.share_params:
            flip = pyrandom.random() < self.flip_ratio
            return [self.apply(r, flip) for r in results]
        return [super(SeqRandomFlip, self).__call__(r) for r in results]


@PIPELINES.register("Pad")
class Pad(_SeqMixin):
    def __init__(self, size_divisor: int = 16,
                 size: Optional[Tuple[int, int]] = None):
        self.size_divisor = size_divisor
        self.size = size

    def transform(self, results):
        for key in results.get("img_fields", ["img"]):
            img = results[key]
            h, w = img.shape[:2]
            if self.size is not None:
                ph, pw = self.size
            else:
                d = self.size_divisor
                ph, pw = (h + d - 1) // d * d, (w + d - 1) // d * d
            out = np.zeros((ph, pw) + img.shape[2:], img.dtype)
            out[:h, :w] = img
            results[key] = out
        results["pad_shape"] = results["img"].shape[:2]
        return results


@PIPELINES.register("SeqPad")
class SeqPad(Pad):
    pass


@PIPELINES.register("RandomCrop")
class RandomCrop:
    def __init__(self, crop_size: Tuple[int, int]):
        self.crop_size = crop_size  # (h, w)

    def apply(self, results, off_h, off_w):
        ch, cw = self.crop_size
        for key in results.get("img_fields", ["img"]):
            results[key] = results[key][off_h:off_h + ch, off_w:off_w + cw]
        results["img_shape"] = results["img"].shape[:2]
        for key in results.get("bbox_fields", []):
            b = results[key] - np.array([off_w, off_h, off_w, off_h], np.float32)
            b[:, 0::2] = b[:, 0::2].clip(0, cw)
            b[:, 1::2] = b[:, 1::2].clip(0, ch)
            results[key] = b
        # drop gts fully outside the crop
        if "gt_bboxes" in results:
            b = results["gt_bboxes"]
            keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
            results["gt_bboxes"] = b[keep]
            for k in ("gt_labels", "gt_instance_ids"):
                if k in results and len(results[k]) == len(keep):
                    results[k] = results[k][keep]
        return results

    def __call__(self, results):
        h, w = results["img_shape"]
        off_h = pyrandom.randint(0, max(h - self.crop_size[0], 0))
        off_w = pyrandom.randint(0, max(w - self.crop_size[1], 0))
        return self.apply(results, off_h, off_w)


@PIPELINES.register("SeqRandomCrop")
class SeqRandomCrop(RandomCrop):
    def __init__(self, crop_size, share_params: bool = True):
        super().__init__(crop_size)
        self.share_params = share_params

    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        if self.share_params:
            h, w = results[0]["img_shape"]
            off_h = pyrandom.randint(0, max(h - self.crop_size[0], 0))
            off_w = pyrandom.randint(0, max(w - self.crop_size[1], 0))
            return [self.apply(r, off_h, off_w) for r in results]
        return [super(SeqRandomCrop, self).__call__(r) for r in results]


# ---------------------------------------------------------------------------
# Photometric transforms (low-light stack)
# ---------------------------------------------------------------------------


def bgr2hsv(img):
    """cv2 float32 BGR->HSV semantics (mmcv.bgr2hsv): H in [0, 360) degrees,
    S in [0, 1], V on the input scale; ties resolve in R > G > B order."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = np.maximum(np.maximum(b, g), r)
    mn = np.minimum(np.minimum(b, g), r)
    diff = v - mn
    s = np.where(v != 0, diff / np.where(v != 0, v, 1.0), 0.0)
    dz = np.where(diff != 0, diff, 1.0)
    h = np.where(v == r, 60.0 * (g - b) / dz,
                 np.where(v == g, 120.0 + 60.0 * (b - r) / dz,
                          240.0 + 60.0 * (r - g) / dz))
    h = np.where(diff == 0, 0.0, h)
    h = np.where(h < 0, h + 360.0, h)
    return np.stack([h, s, v], axis=-1).astype(np.float32)


def hsv2bgr(hsv):
    """cv2 float32 HSV->BGR (mmcv.hsv2bgr): standard 6-sector formula."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h60 = h / 60.0
    i = (np.floor(h60).astype(np.int64) % 6).astype(np.int64)
    f = h60 - np.floor(h60)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([b, g, r], axis=-1).astype(np.float32)


@PIPELINES.register("PhotoMetricDistortion")
class PhotoMetricDistortion:
    """Exact mmtrack SeqPhotoMetricDistortion / mmdet PhotoMetricDistortion
    semantics (mmtrack/datasets/pipelines/transforms.py:797-954): each step
    fires with probability 0.5 — brightness delta +-32, contrast [.5, 1.5]
    applied before OR after the HSV block (random mode), saturation [.5, 1.5]
    and hue +-18 deg IN HSV SPACE (cv2 float conventions, H wrapped to
    [0, 360)), then a random channel permutation. 6-channel noisy/clean
    pairs are jittered as two 3-channel groups with shared params."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def params(self):
        return dict(
            delta=(pyrandom.uniform(-self.brightness_delta,
                                    self.brightness_delta)
                   if pyrandom.random() < 0.5 else None),
            contrast_first=pyrandom.random() < 0.5,
            alpha=(pyrandom.uniform(*self.contrast_range)
                   if pyrandom.random() < 0.5 else None),
            saturation=(pyrandom.uniform(*self.saturation_range)
                        if pyrandom.random() < 0.5 else None),
            hue=(pyrandom.uniform(-self.hue_delta, self.hue_delta)
                 if pyrandom.random() < 0.5 else None),
            permutation=(tuple(np.random.permutation(3))
                         if pyrandom.random() < 0.5 else None),
        )

    def _distort3(self, img, p):
        img = img.astype(np.float32)
        if p["delta"] is not None:
            img = img + p["delta"]
        if p["contrast_first"] and p["alpha"] is not None:
            img = img * p["alpha"]
        if p["saturation"] is not None or p["hue"] is not None:
            hsv = bgr2hsv(img)
            if p["saturation"] is not None:
                hsv[..., 1] *= p["saturation"]
            if p["hue"] is not None:
                hsv[..., 0] += p["hue"]
                hsv[..., 0][hsv[..., 0] > 360] -= 360
                hsv[..., 0][hsv[..., 0] < 0] += 360
            img = hsv2bgr(hsv)
        if not p["contrast_first"] and p["alpha"] is not None:
            img = img * p["alpha"]
        if p["permutation"] is not None:
            img = img[..., list(p["permutation"])]
        return img

    def apply(self, results, p):
        for key in results.get("img_fields", ["img"]):
            img = results[key].astype(np.float32)
            if img.shape[-1] % 3 == 0 and img.shape[-1] > 3:
                groups = [self._distort3(img[..., i:i + 3], p)
                          for i in range(0, img.shape[-1], 3)]
                results[key] = np.concatenate(groups, axis=-1)
            else:
                results[key] = self._distort3(img, p)
        return results

    def __call__(self, results):
        return self.apply(results, self.params())


@PIPELINES.register("SeqPhotoMetricDistortion")
class SeqPhotoMetricDistortion(PhotoMetricDistortion):
    def __init__(self, share_params: bool = True, **kw):
        super().__init__(**kw)
        self.share_params = share_params

    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        if self.share_params:
            p = self.params()
            return [self.apply(r, p) for r in results]
        return [super(SeqPhotoMetricDistortion, self).__call__(r) for r in results]


@PIPELINES.register("Brighten")
class Brighten:
    """Amplify a dark image so its mean ≈ m (transforms.py:374-404); for a
    6ch pair only the noisy half is amplified, and the amp is recorded in
    ``brighten_level`` so Seq/pair siblings share it."""

    def __init__(self, m: float = 0.5):
        self.m = m

    def __call__(self, results):
        for key in results.get("img_fields", ["img"]):
            img = results[key]
            dark = img[..., :3] if img.shape[-1] == 6 else img
            amp = results.get("brighten_level")
            if amp is None:
                dark_n = dark.astype(np.float32) / 255.0
                amp = self.m * dark_n.size / max(float(dark_n.sum()), 1e-6)
            bright = np.clip(dark.astype(np.float32) * amp, 0, 255.0)
            bright = bright.astype(img.dtype)
            if img.shape[-1] == 6:
                results[key] = np.concatenate([bright, img[..., 3:]], axis=-1)
            else:
                results[key] = bright
            results["brighten_level"] = amp
        return results


@PIPELINES.register("SeqBrighten")
class SeqBrighten(Brighten):
    def __init__(self, m: float = 0.5, share_params: bool = True):
        super().__init__(m)
        self.share_params = share_params

    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        outs, level = [], None
        for i, r in enumerate(results):
            if self.share_params and i > 0:
                r["brighten_level"] = level
            r = super().__call__(r)
            if self.share_params and i == 0:
                level = r["brighten_level"]
            outs.append(r)
        return outs


@PIPELINES.register("NormalizePairs")
@PIPELINES.register("Normalize")
class NormalizePairs(_SeqMixin):
    """ImageNet normalization; both halves of a 6ch pair independently
    (transforms.py:434-474). ``to_rgb`` flips BGR→RGB like mmcv."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def _norm3(self, img):
        img = img.astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        return (img - self.mean) / self.std

    def transform(self, results):
        for key in results.get("img_fields", ["img"]):
            img = results[key]
            if img.shape[-1] == 6:
                results[key] = np.concatenate(
                    [self._norm3(img[..., :3]), self._norm3(img[..., 3:])],
                    axis=-1,
                )
            else:
                results[key] = self._norm3(img)
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register("SeqNormalize")
class SeqNormalize(NormalizePairs):
    pass


@PIPELINES.register("NormalizeRAW")
class NormalizeRAW(_SeqMixin):
    """Normalize 8ch RGGB pairs with 4ch mean/std tiled to both halves
    (transforms.py:513-539)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def transform(self, results):
        for key in results.get("img_fields", ["img"]):
            img = results[key].astype(np.float32)
            assert img.shape[-1] % 4 == 0, "RAW images have 4k channels"
            reps = img.shape[-1] // 4
            mean = np.tile(self.mean, reps)
            std = np.tile(self.std, reps)
            results[key] = (img - mean) / std
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std)
        return results


@PIPELINES.register("SeqNormalizeRAW")
class SeqNormalizeRAW(NormalizeRAW):
    pass


@PIPELINES.register("sRGB2RAW")
class SRGB2RAW:
    """Unprocess sRGB → RGGB raw (transforms.py:958-1110) via
    ``ops.unprocess``: random CCM, random WB gains, inverse tone map, gamma
    decompression, mosaic to 4ch; ccm/gain shared across a clip."""

    def __init__(self, seed: Optional[int] = None):
        self._seed = seed

    def _unprocess(self, img01, key):
        import jax.numpy as jnp

        from ...ops import unprocess as U

        cg = U.random_ccm_gain(key)
        raw = U.srgb_to_raw(
            jnp.asarray(img01), cg,
            tone_mapping=True, gamma_compression=True,
            color_correction=True, white_balance=True,
        )
        return np.asarray(raw), cg

    def __call__(self, results, _shared=None):
        import jax

        key = jax.random.PRNGKey(
            self._seed if self._seed is not None
            else pyrandom.randrange(2**31)
        )
        for k in results.get("img_fields", ["img"]):
            img = results[k].astype(np.float32) / 255.0
            if img.shape[-1] == 6:
                raw_n, _ = self._unprocess(img[..., :3][..., ::-1], key)
                raw_c, _ = self._unprocess(img[..., 3:][..., ::-1], key)
                results[k] = np.concatenate([raw_n, raw_c], axis=-1)
            else:
                raw, _ = self._unprocess(img[..., ::-1], key)
                results[k] = raw
            results["img_shape"] = results[k].shape[:2]
        return results


@PIPELINES.register("SeqsRGB2RAW")
class SeqSRGB2RAW(SRGB2RAW):
    def __init__(self, share_params: bool = True, seed: Optional[int] = None):
        super().__init__(seed)
        self.share_params = share_params

    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        if self.share_params and self._seed is None:
            seed = pyrandom.randrange(2**31)
            fixed = SRGB2RAW(seed=seed)
            return [fixed(r) for r in results]
        return [super(SeqSRGB2RAW, self).__call__(r) for r in results]


@PIPELINES.register("AddNoise")
class AddNoise:
    """Synthesize a (noise, clean) pair from a clean frame
    (transforms.py:1133-1251): output = 2xC channel concat. ``noise_type``
    selects the camera model from ``ops.noise``."""

    def __init__(self, noise_type: str = "a7s3", am: float = 0.8,
                 seed: Optional[int] = None, **noise_kw):
        self.noise_type = noise_type
        self.am = am
        self.noise_kw = noise_kw
        self._seed = seed

    def _apply(self, img, seed):
        import jax
        import jax.numpy as jnp

        from ...ops import noise as N

        key = jax.random.PRNGKey(seed)
        clean = jnp.asarray(img.astype(np.float32))[None]
        fn = {
            "gauss": N.gaussian_noise,
            "gaussian": N.gaussian_noise,
            "mix": N.poisson_gaussian_noise,
            "possion_gaussian": N.poisson_gaussian_noise,
            "a7s3": N.real_camera_noise_a7s3,
            "a7s3_jpg": N.real_camera_noise_a7s3_jpg,
        }[self.noise_type]
        noisy = fn(key, clean, am=self.am, **self.noise_kw)[0]
        return np.asarray(noisy)

    def __call__(self, results):
        seed = (self._seed if self._seed is not None
                else pyrandom.randrange(2**31))
        for k in results.get("img_fields", ["img"]):
            img = results[k]
            noisy = self._apply(img, seed)
            results[k] = np.concatenate(
                [noisy, img.astype(np.float32)], axis=-1
            )
        return results


@PIPELINES.register("SeqAddNoise")
class SeqAddNoise(AddNoise):
    def __init__(self, share_params: bool = True, **kw):
        super().__init__(**kw)
        self.share_params = share_params

    def __call__(self, results):
        if isinstance(results, dict):
            return super().__call__(results)
        if self.share_params and self._seed is None:
            seed = pyrandom.randrange(2**31)
            outs = []
            for r in results:
                saved, self._seed = self._seed, seed
                outs.append(super().__call__(r))
                self._seed = saved
            return outs
        return [super(SeqAddNoise, self).__call__(r) for r in results]


# ---------------------------------------------------------------------------
# SOT augmentations
# ---------------------------------------------------------------------------


def _crop_with_context(img, bbox, context_amount, out_size, pad_value):
    """SiamFC-style crop around bbox with context (transforms.py:16-139)."""
    import cv2

    x1, y1, x2, y2 = bbox
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    w, h = x2 - x1, y2 - y1
    wc = w + context_amount * (w + h)
    hc = h + context_amount * (w + h)
    s = np.sqrt(max(wc * hc, 1e-6))
    half = s / 2
    xa, ya = cx - half, cy - half
    xb, yb = cx + half, cy + half
    H, W = img.shape[:2]
    pad_l, pad_t = max(0, -int(np.floor(xa))), max(0, -int(np.floor(ya)))
    pad_r, pad_b = max(0, int(np.ceil(xb)) - W), max(0, int(np.ceil(yb)) - H)
    padded = cv2.copyMakeBorder(img, pad_t, pad_b, pad_l, pad_r,
                                cv2.BORDER_CONSTANT, value=pad_value)
    xa_i, ya_i = int(np.floor(xa)) + pad_l, int(np.floor(ya)) + pad_t
    crop = padded[ya_i:ya_i + int(round(s)), xa_i:xa_i + int(round(s))]
    crop = cv2.resize(crop, (out_size, out_size))
    scale = out_size / max(s, 1e-6)
    new_bbox = np.array([
        (x1 - (cx - half)) * scale, (y1 - (cy - half)) * scale,
        (x2 - (cx - half)) * scale, (y2 - (cy - half)) * scale,
    ], np.float32)
    return crop, new_bbox


@PIPELINES.register("SeqCropLikeSiamFC")
class SeqCropLikeSiamFC:
    def __init__(self, context_amount: float = 0.5, exemplar_size: int = 127,
                 crop_size: int = 511):
        self.context_amount = context_amount
        self.exemplar_size = exemplar_size
        self.crop_size = crop_size

    def __call__(self, results):
        singleton = isinstance(results, dict)
        rs = [results] if singleton else results
        outs = []
        for r in rs:
            img = r["img"]
            bbox = r["gt_bboxes"][0]
            mean_val = tuple(float(m) for m in img.mean(axis=(0, 1)))
            scale = (self.crop_size / self.exemplar_size)
            crop, new_bbox = _crop_with_context(
                img, bbox, self.context_amount,
                int(self.exemplar_size * scale), mean_val,
            )
            r["img"] = crop
            r["gt_bboxes"] = new_bbox[None]
            r["img_shape"] = crop.shape[:2]
            outs.append(r)
        return outs[0] if singleton else outs


@PIPELINES.register("SeqShiftScaleAug")
class SeqShiftScaleAug:
    """Random shift+scale crop to target sizes per frame (template, search)."""

    def __init__(self, target_size=(127, 255), shift=(4, 64),
                 scale=(0.05, 0.18)):
        self.target_size = target_size
        self.shift = shift
        self.scale = scale

    def __call__(self, results):
        import cv2

        outs = []
        for i, r in enumerate(results):
            size = self.target_size[min(i, len(self.target_size) - 1)]
            shift = self.shift[min(i, len(self.shift) - 1)]
            scale = self.scale[min(i, len(self.scale) - 1)]
            img = r["img"]
            h, w = img.shape[:2]
            sj = 1.0 + pyrandom.uniform(-scale, scale)
            crop_sz = min(int(size * sj), h - 1, w - 1)
            cx = w // 2 + pyrandom.randint(-shift, shift)
            cy = h // 2 + pyrandom.randint(-shift, shift)
            x1 = int(np.clip(cx - crop_sz / 2, 0, w - crop_sz))
            y1 = int(np.clip(cy - crop_sz / 2, 0, h - crop_sz))
            crop = img[y1:y1 + crop_sz, x1:x1 + crop_sz]
            r["img"] = cv2.resize(crop, (size, size))
            rs = size / crop_sz
            if "gt_bboxes" in r and len(r["gt_bboxes"]):
                b = (r["gt_bboxes"] - [x1, y1, x1, y1]) * rs
                r["gt_bboxes"] = np.clip(b, 0, size).astype(np.float32)
            r["img_shape"] = r["img"].shape[:2]
            outs.append(r)
        return outs


@PIPELINES.register("SeqColorAug")
class SeqColorAug:
    """Random color mixing matrix (transforms.py:238-285)."""

    def __init__(self, prob=(1.0, 1.0)):
        self.prob = prob

    def __call__(self, results):
        outs = []
        for i, r in enumerate(results):
            p = self.prob[min(i, len(self.prob) - 1)]
            if pyrandom.random() < p:
                mix = np.eye(3, dtype=np.float32) \
                    + np.random.uniform(-0.05, 0.05, (3, 3)).astype(np.float32)
                img = r["img"].astype(np.float32)
                r["img"] = np.clip(img @ mix.T, 0, 255)
            outs.append(r)
        return outs


@PIPELINES.register("SeqBlurAug")
class SeqBlurAug:
    """Random box blur (transforms.py:288-330)."""

    def __init__(self, prob=(0.0, 0.2)):
        self.prob = prob

    def __call__(self, results):
        import cv2

        outs = []
        for i, r in enumerate(results):
            p = self.prob[min(i, len(self.prob) - 1)]
            if pyrandom.random() < p:
                k = pyrandom.choice((3, 5, 7))
                r["img"] = cv2.blur(r["img"], (k, k))
            outs.append(r)
        return outs


# ---------------------------------------------------------------------------
# Processing
# ---------------------------------------------------------------------------


@PIPELINES.register("MatchInstances")
class MatchInstances:
    """Computes gt_match_indices between key and ref via instance ids
    (processing.py:6-54)."""

    def __call__(self, results):
        assert isinstance(results, (list, tuple)) and len(results) >= 2
        key, ref = results[0], results[1]
        key_ids = key.get("gt_instance_ids", np.zeros((0,), np.int64))
        ref_ids = ref.get("gt_instance_ids", np.zeros((0,), np.int64))
        ref_index = {int(v): j for j, v in enumerate(ref_ids)}
        key_match = np.array(
            [ref_index.get(int(v), -1) for v in key_ids], np.int64
        )
        key_index = {int(v): j for j, v in enumerate(key_ids)}
        ref_match = np.array(
            [key_index.get(int(v), -1) for v in ref_ids], np.int64
        )
        key["gt_match_indices"] = key_match
        ref["gt_match_indices"] = ref_match
        return results
