"""RegionAssigner golden vs an independent numpy transcription of
mmdet/core/bbox/assigners/region_assigner.py:36-204 (Cascade RPN stage 1:
center_ratio=.2, ignore_ratio=.5, one square anchor per cell).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import region_assign


def numpy_region_assign(gts, valid, featmap_sizes, strides, anchor_scale=8.0,
                        center_ratio=0.2, ignore_ratio=0.5):
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    L = len(featmap_sizes)
    scale = np.sqrt(np.maximum(
        (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]), 1e-12))
    target_lvls = np.clip(
        np.floor(np.log2(scale) - np.log2(anchor_scale * strides[0]) + 0.5),
        0, L - 1).astype(int)

    def calc_region(bbox, ratio, stride, fs):
        f = bbox / stride
        x1 = np.clip(np.round((1 - ratio) * f[0] + ratio * f[2]), 0, fs[1])
        y1 = np.clip(np.round((1 - ratio) * f[1] + ratio * f[3]), 0, fs[0])
        x2 = np.clip(np.round(ratio * f[0] + (1 - ratio) * f[2]), 0, fs[1])
        y2 = np.clip(np.round(ratio * f[1] + (1 - ratio) * f[3]), 0, fs[0])
        return x1, y1, x2, y2

    def ctr_flags(fs, region):
        h, w = fs
        x = np.arange(w)[None, :].repeat(h, 0).reshape(-1)
        y = np.arange(h)[:, None].repeat(w, 1).reshape(-1)
        x1, y1, x2, y2 = region
        return (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)

    assigned = [np.zeros(h * w, np.int64) for h, w in featmap_sizes]
    ignore = [np.zeros(h * w, bool) for h, w in featmap_sizes]
    for g in range(gts.shape[0]):
        if not valid[g]:
            continue
        lvl = target_lvls[g]
        fs, s = featmap_sizes[lvl], strides[lvl]
        assigned[lvl][ctr_flags(fs, calc_region(gts[g], r2, s, fs))] = -1
        assigned[lvl][ctr_flags(fs, calc_region(gts[g], r1, s, fs))] = g + 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < L:
                dfs, ds = featmap_sizes[d], strides[d]
                ignore[d][ctr_flags(dfs, calc_region(gts[g], r2, ds, dfs))] = 1
    for lvl in range(L):
        assigned[lvl][ignore[lvl]] = -1
    return np.concatenate(assigned)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_region_assign_matches_numpy_transcription(seed):
    rng = np.random.RandomState(seed)
    featmap_sizes = [(16, 16), (8, 8), (4, 4)]
    strides = [8, 16, 32]
    G = 5
    cxcy = rng.uniform(8, 120, (G, 2))
    wh = np.exp(rng.uniform(np.log(16), np.log(120), (G, 2)))
    gts = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    valid = rng.rand(G) > 0.25

    want = numpy_region_assign(gts, valid, featmap_sizes, strides,
                               anchor_scale=4.0)
    got = jax.jit(lambda g, v: region_assign(
        g, v, featmap_sizes, strides, anchor_scale=4.0))(
        jnp.asarray(gts), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_all_invalid_gts_all_negative():
    got = region_assign(jnp.zeros((2, 4)), jnp.asarray([False, False]),
                        [(8, 8)], [16])
    assert (np.asarray(got) == 0).all()
