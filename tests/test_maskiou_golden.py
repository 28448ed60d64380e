"""MaskIoU-target golden vs a numpy transcription of the mmdet algorithm.

Reference: mmdetection/mmdet/models/roi_heads/mask_heads/maskiou_head.py
get_targets (L101-148) + _get_area_ratio (L150-175): the regression target
is IoU(binarized predicted mask inside the box, WHOLE gt instance), where
the full-instance area is recovered in mask-grid units by dividing the
in-box gt mask area by the BitmapMasks.crop area ratio (int-cast box,
boundary-clipped, >=1px slice).

The numpy side below loops per roi with integer slicing — the reference's
actual control flow — against the vectorized indicator-mask formulation
under test.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads.mask_head import (
    mask_iou_targets,
)


def _np_maskiou_targets(pred_bin, m_tgts, gt_masks, matched, rois):
    h, w = gt_masks.shape[1:]
    n = rois.shape[0]
    out = np.zeros(n, np.float32)
    for i in range(n):
        gm = gt_masks[matched[i]]
        full_area = gm.sum()
        # BitmapMasks.crop: int cast, clip to map, slice at least 1 px
        bbox = rois[i].astype(np.int32)
        x1 = np.clip(bbox[0], 0, w)
        y1 = np.clip(bbox[1], 0, h)
        x2 = np.clip(bbox[2], 0, w)
        y2 = np.clip(bbox[3], 0, h)
        bw = max(x2 - x1, 1)
        bh = max(y2 - y1, 1)
        in_area = gm[y1:y1 + bh, x1:x1 + bw].sum()
        ratio = in_area / (full_area + 1e-7)

        gt_full = m_tgts[i].sum() / (ratio + 1e-7)
        overlap = (pred_bin[i] * m_tgts[i]).sum()
        pred_area = pred_bin[i].sum()
        out[i] = overlap / (pred_area + gt_full - overlap)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_maskiou_targets_match_numpy_transcription(seed):
    rng = np.random.RandomState(seed)
    g, h, w, n, s = 3, 32, 40, 6, 14
    # blobby gt instances: random rectangles, guaranteed non-empty
    gt_masks = np.zeros((g, h, w), np.float32)
    for k in range(g):
        x1, y1 = rng.randint(0, w - 10), rng.randint(0, h - 10)
        gt_masks[k, y1:y1 + rng.randint(6, 14), x1:x1 + rng.randint(6, 14)] = 1

    matched = rng.randint(0, g, size=n)
    # rois overlapping the instances (fractional coords), some extending
    # past the instance so the out-of-box area matters
    rois = np.stack([
        np.clip(rng.rand(n) * w * 0.6, 0, w - 8),
        np.clip(rng.rand(n) * h * 0.6, 0, h - 8),
        np.zeros(n), np.zeros(n),
    ], axis=1).astype(np.float32)
    rois[:, 2] = np.clip(rois[:, 0] + 6 + rng.rand(n) * 18, 0, w)
    rois[:, 3] = np.clip(rois[:, 1] + 6 + rng.rand(n) * 18, 0, h)

    pred_bin = (rng.rand(n, s, s) < 0.5).astype(np.float32)
    m_tgts = (rng.rand(n, s, s) < 0.4).astype(np.float32)
    # ensure no degenerate all-zero rows (reference divides without eps)
    pred_bin[:, 0, 0] = 1.0
    m_tgts[:, 1, 1] = 1.0

    want = _np_maskiou_targets(pred_bin, m_tgts, gt_masks, matched, rois)
    got = np.asarray(mask_iou_targets(
        jnp.asarray(pred_bin), jnp.asarray(m_tgts), jnp.asarray(gt_masks),
        jnp.asarray(matched), jnp.asarray(rois)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_out_of_box_instance_area_lowers_target():
    """A gt instance extending past the box must lower the IoU target even
    when the in-box prediction is perfect — the property the reference's
    area-ratio construction exists for."""
    h, w, s = 20, 20, 8
    # instance A fits the box exactly; instance B extends far beyond it
    gt = np.zeros((2, h, w), np.float32)
    gt[0, 5:10, 5:10] = 1
    gt[1, 5:10, 5:18] = 1
    rois = np.array([[5, 5, 10, 10], [5, 5, 10, 10]], np.float32)
    matched = np.array([0, 1])
    perfect = np.ones((2, s, s), np.float32)
    tgt = np.asarray(mask_iou_targets(
        jnp.asarray(perfect), jnp.asarray(perfect), jnp.asarray(gt),
        jnp.asarray(matched), jnp.asarray(rois)))
    assert tgt[0] == pytest.approx(1.0, abs=1e-5)
    assert tgt[1] < 0.55  # 5/13 of the instance is outside the box
