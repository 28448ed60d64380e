"""CenterRegionAssigner golden vs an independent numpy transcription of
mmdet/core/bbox/assigners/center_region_assigner.py:71-254 (the FSAF
assigner: pos_scale=neg_scale=0.2, min_pos_iof=0.01), plus FSAF
level-selection properties on the rewritten exact loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import (
    center_region_assign)


def numpy_center_region(boxes, gts, labels, pos_scale, neg_scale,
                        min_pos_iof=1e-2):
    """Transcription of CenterRegionAssigner.assign for valid gts only.
    Returns (assigned [N] 0/k>0, labels [N] or -1, shadowed set of
    (box, gt0based) pairs)."""

    def scale(b, s):
        c = (b[:, :2] + b[:, 2:]) / 2
        half = (b[:, 2:] - b[:, :2]) / 2 * s
        return np.concatenate([c - half, c + half], -1)

    def iof(a, r):
        ix1 = np.maximum(a[:, None, 0], r[None, :, 0])
        iy1 = np.maximum(a[:, None, 1], r[None, :, 1])
        ix2 = np.minimum(a[:, None, 2], r[None, :, 2])
        iy2 = np.minimum(a[:, None, 3], r[None, :, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        area = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        return inter / np.maximum(area[:, None], 1e-6)

    N, G = boxes.shape[0], gts.shape[0]
    ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
    in_gt = ((ctr[:, 0:1] > gts[None, :, 0]) & (ctr[:, 0:1] < gts[None, :, 2])
             & (ctr[:, 1:2] > gts[None, :, 1])
             & (ctr[:, 1:2] < gts[None, :, 3]))
    in_core = in_gt & (iof(boxes, scale(gts, pos_scale)) > min_pos_iof)
    in_shadow = (iof(boxes, scale(gts, neg_scale)) > min_pos_iof) & ~in_core

    # get_gt_priorities: rank in descending-area order (smaller = higher)
    areas = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    prio = np.argsort(np.argsort(-areas, kind="stable"), kind="stable")

    assigned = np.zeros(N, np.int64)
    shadow_pairs = set(map(tuple, np.argwhere(in_shadow)))
    match = in_core.any(1)
    if match.any():
        pair_pr = np.where(in_core, prio[None, :], -1)
        arg = pair_pr.argmax(1)
        assigned[match] = arg[match] + 1
        lost = in_core.copy()
        lost[np.arange(N)[match], arg[match]] = False
        shadow_pairs |= set(map(tuple, np.argwhere(lost)))

    out_labels = np.full(N, -1, np.int64)
    p = assigned > 0
    out_labels[p] = labels[assigned[p] - 1]
    # override: a positive shadowed by a same-class gt becomes background
    for (n, g) in sorted(shadow_pairs):
        if out_labels[n] == labels[g]:
            out_labels[n] = -1
            assigned[n] = 0
    return assigned, out_labels, shadow_pairs


def _anchor_pyramid():
    anc = []
    for (h, w), s in zip([(16, 16), (8, 8), (4, 4)], (8, 16, 32)):
        ys, xs = np.meshgrid(np.arange(h) * s, np.arange(w) * s,
                             indexing="ij")
        cx, cy = xs.reshape(-1).astype(np.float32), ys.reshape(-1).astype(
            np.float32)
        anc.append(np.stack([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2],
                            -1))
    return np.concatenate(anc)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_center_region_matches_numpy_transcription(seed):
    rng = np.random.RandomState(seed)
    boxes = _anchor_pyramid()
    G = 6
    cxcy = rng.uniform(8, 120, (G, 2))
    wh = np.exp(rng.uniform(np.log(8), np.log(100), (G, 2)))
    gts = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    labels = rng.randint(0, 3, G).astype(np.int32)  # few classes -> overlaps
    valid = np.ones(G, bool)

    want_a, want_l, want_sh = numpy_center_region(boxes, gts, labels, 0.2, 0.2)

    ar, shadowed = jax.jit(
        lambda b, g, l, v: center_region_assign(b, g, l, v, 0.2, 0.2)
    )(jnp.asarray(boxes), jnp.asarray(gts), jnp.asarray(labels),
      jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(ar.assigned_gt_inds), want_a)
    np.testing.assert_array_equal(np.asarray(ar.labels), want_l)
    got_sh = set(map(tuple, np.argwhere(np.asarray(shadowed))))
    assert got_sh == want_sh


def test_invalid_gts_never_assign():
    boxes = _anchor_pyramid()
    gts = jnp.asarray([[10., 10., 60., 60.], [0., 0., 0., 0.]])
    ar, shadowed = center_region_assign(
        jnp.asarray(boxes), gts, jnp.asarray([1, 0], jnp.int32),
        jnp.asarray([False, False]), 0.2, 0.2)
    assert int((np.asarray(ar.assigned_gt_inds) > 0).sum()) == 0
    assert not bool(np.asarray(shadowed).any())


class TestFSAFOnlineSelection:
    def _outs(self, num_c=4):
        shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
        outs = []
        for h, w in shapes:
            cls = np.full((h, w, num_c), -6.0, np.float32)
            reg = np.full((h, w, 4), 0.5, np.float32)
            outs.append([cls, reg])
        return outs, shapes

    def test_gt_keeps_only_its_argmin_level(self):
        """Make level 1's regression nearly perfect for the gt; the online
        selection must route the whole gt to level 1 — zeroing level-0
        positives' reg contribution."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fsaf_head import (
            FSAF_STRIDES, fsaf_loss, _centers)

        num_c = 4
        gt = jnp.asarray([[24.0, 24.0, 72.0, 72.0]])
        gl = jnp.asarray([2], jnp.int32)
        gv = jnp.asarray([True])
        outs, shapes = self._outs(num_c)

        # level 1 (stride 16): set TBLR preds to the exact distances
        s = FSAF_STRIDES[1]
        h, w = shapes[1]
        px, py = _centers(h, w, s)
        px, py = np.asarray(px).reshape(h, w), np.asarray(py).reshape(h, w)
        t = (py - 24.0) / (4 * s)
        b = (72.0 - py) / (4 * s)
        l = (px - 24.0) / (4 * s)
        r = (72.0 - px) / (4 * s)
        outs[1][1] = np.stack([t, b, l, r], -1).astype(np.float32)

        flat = [tuple(jnp.asarray(a)[None] for a in lvl) for lvl in outs]
        flat = [(c[0], r0[0]) for c, r0 in flat]
        loss_good = fsaf_loss(flat, gt, gl, gv, num_c)

        # same but the good level is 0: selection must follow it
        outs2, _ = self._outs(num_c)
        s0 = FSAF_STRIDES[0]
        h0, w0 = shapes[0]
        px0, py0 = _centers(h0, w0, s0)
        px0, py0 = (np.asarray(px0).reshape(h0, w0),
                    np.asarray(py0).reshape(h0, w0))
        outs2[0][1] = np.stack([
            (py0 - 24.0) / (4 * s0), (72.0 - py0) / (4 * s0),
            (px0 - 24.0) / (4 * s0), (72.0 - px0) / (4 * s0)],
            -1).astype(np.float32)
        flat2 = [(jnp.asarray(c), jnp.asarray(r0)) for c, r0 in outs2]
        loss_good0 = fsaf_loss(flat2, gt, gl, gv, num_c)

        # a run with NO good level anywhere
        outs3, _ = self._outs(num_c)
        flat3 = [(jnp.asarray(c), jnp.asarray(r0)) for c, r0 in outs3]
        loss_bad = fsaf_loss(flat3, gt, gl, gv, num_c)

        # selection picks the near-zero-reg level in both placements; both
        # must beat the no-good-level run's reg loss
        assert float(loss_good.loss_bbox) < float(loss_bad.loss_bbox)
        assert float(loss_good0.loss_bbox) < float(loss_bad.loss_bbox)

    def test_zero_valid_gts_finite(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fsaf_head import (
            fsaf_loss)

        outs, _ = self._outs()
        flat = [(jnp.asarray(c), jnp.asarray(r)) for c, r in outs]
        l = fsaf_loss(flat, jnp.zeros((2, 4)), jnp.zeros((2,), jnp.int32),
                      jnp.asarray([False, False]), 4)
        assert np.isfinite(float(l.loss_cls))
        assert np.isfinite(float(l.loss_bbox))
