"""RepPoints exact-semantics goldens.

1. PointAssigner (mmdet/core/bbox/assigners/point_assigner.py:22-131) vs an
   independent numpy transcription of the reference algorithm (sequential gt
   loop, gt-normalized distances, per-level candidate masking, strict-less
   conflict resolution).
2. The moment transform's std convention vs torch.std (UNBIASED, ddof=1) —
   mmdet points2bbox (reppoints_head.py:196-211) uses torch.std's default.
3. Refine-stage assignment shape: joint over levels (one MaxIoU call over the
   concatenated init boxes), matching get_targets' per-image concat.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import point_assign


def numpy_point_assigner(points, gt_bboxes, gt_valid, scale=4, pos_num=1):
    """Transcription of mmdet PointAssigner.assign. points: [P, 3] (x, y,
    stride). Returns assigned_gt_inds [P] (0=neg, k>0=gt k-1), restricted to
    valid gts (invalid rows are skipped, emulating the unpadded call)."""
    points_xy = points[:, :2]
    points_lvl = np.log2(points[:, 2]).astype(np.int32)
    lvl_min, lvl_max = points_lvl.min(), points_lvl.max()

    gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2
    gt_wh = np.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6, None)
    gt_lvl = ((np.log2(gt_wh[:, 0] / scale)
               + np.log2(gt_wh[:, 1] / scale)) / 2).astype(np.int32)
    gt_lvl = np.clip(gt_lvl, lvl_min, lvl_max)

    num_points = points.shape[0]
    assigned_gt_inds = np.zeros(num_points, np.int64)
    assigned_gt_dist = np.full(num_points, np.inf)
    points_range = np.arange(num_points)
    for idx in range(gt_bboxes.shape[0]):
        if not gt_valid[idx]:
            continue
        lvl_idx = gt_lvl[idx] == points_lvl
        points_index = points_range[lvl_idx]
        lvl_points = points_xy[lvl_idx]
        d = np.linalg.norm((lvl_points - gt_xy[idx]) / gt_wh[idx], axis=1)
        k = min(pos_num, len(d))
        if k == 0:
            continue
        min_dist_index = np.argsort(d)[:k]
        min_dist = d[min_dist_index]
        min_dist_points_index = points_index[min_dist_index]
        less = min_dist < assigned_gt_dist[min_dist_points_index]
        sel = min_dist_points_index[less]
        assigned_gt_inds[sel] = idx + 1
        assigned_gt_dist[sel] = min_dist[less]
    return assigned_gt_inds


def _point_pyramid():
    pts = []
    for (h, w), s in zip([(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)],
                         (8, 16, 32, 64, 128)):
        ys, xs = np.meshgrid(np.arange(h) * s, np.arange(w) * s,
                             indexing="ij")
        pts.append(np.stack([xs.reshape(-1), ys.reshape(-1),
                             np.full(h * w, s)], -1))
    return np.concatenate(pts).astype(np.float32)


@pytest.mark.parametrize("seed,pos_num", [(0, 1), (1, 1), (2, 3)])
def test_point_assigner_matches_numpy_transcription(seed, pos_num):
    rng = np.random.RandomState(seed)
    points = _point_pyramid()
    G = 7
    cxcy = rng.uniform(0, 128, (G, 2))
    wh = np.exp(rng.uniform(np.log(4), np.log(300), (G, 2)))
    gts = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    valid = rng.rand(G) > 0.25
    labels = rng.randint(0, 5, G).astype(np.int32)

    want = numpy_point_assigner(points, gts, valid, pos_num=pos_num)

    got = jax.jit(
        lambda xy, lvl, g, l, v: point_assign(xy, lvl, g, l, v,
                                              pos_num=pos_num)
    )(jnp.asarray(points[:, :2]),
      jnp.asarray(np.log2(points[:, 2]).astype(np.int32)),
      jnp.asarray(gts), jnp.asarray(labels), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(got.assigned_gt_inds), want)
    # labels of positives follow the matched gt
    pos = want > 0
    np.testing.assert_array_equal(
        np.asarray(got.labels)[pos], labels[want[pos] - 1])
    assert (np.asarray(got.labels)[~pos] == -1).all()


def test_moment_transform_matches_torch_std():
    torch = pytest.importorskip("torch")
    from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.reppoints_head import (
        NUM_POINTS, points_to_boxes)

    rng = np.random.RandomState(3)
    P, stride = 5, 16.0
    pts = rng.randn(P, NUM_POINTS, 2).astype(np.float32)  # (dy, dx)
    centers = rng.uniform(0, 100, (P, 2)).astype(np.float32)
    mt = np.asarray([0.25, -0.4], np.float32)

    got = np.asarray(points_to_boxes(
        jnp.asarray(pts.reshape(P, -1)), jnp.asarray(centers), stride,
        moment_params=jnp.asarray(mt)))

    # torch transcription of points2bbox 'moment' (y-first interleave)
    t = torch.from_numpy(pts.reshape(P, -1))
    pts_y = t[:, 0::2]
    pts_x = t[:, 1::2]
    y_mean = pts_y.mean(dim=1)
    x_mean = pts_x.mean(dim=1)
    y_std = torch.std(pts_y - y_mean[:, None], dim=1)  # unbiased default
    x_std = torch.std(pts_x - x_mean[:, None], dim=1)
    hw = (x_std * np.exp(mt[0])).numpy() * stride
    hh = (y_std * np.exp(mt[1])).numpy() * stride
    cx = centers[:, 0] + x_mean.numpy() * stride
    cy = centers[:, 1] + y_mean.numpy() * stride
    want = np.stack([cx - hw, cy - hh, cx + hw, cy + hh], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_perfect_init_prediction_zeroes_the_init_loss():
    """Craft init offsets whose moment decode reproduces the assigned gt
    exactly -> loss_pts_init == 0 (up to fp) while refine/cls stay finite."""
    from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.reppoints_head import (
        NUM_POINTS, _centers, points_to_boxes, reppoints_loss)

    shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    strides = (8, 16, 32, 64, 128)
    gt = np.asarray([[20.0, 24.0, 52.0, 72.0]], np.float32)  # w=32 h=48
    gt_valid = jnp.asarray([True])
    gt_labels = jnp.asarray([2], jnp.int32)

    # base pattern with zero mean and known unbiased std per axis
    base = np.zeros((NUM_POINTS, 2), np.float32)
    base[:4, 0] = [1, -1, 1, -1]
    base[:4, 1] = [1, 1, -1, -1]
    s_b = base.std(0, ddof=1)  # per-axis unbiased std

    levels = []
    num_c = 4
    for (h, w), s in zip(shapes, strides):
        cls = np.full((h, w, num_c), -8.0, np.float32)
        init = np.zeros((h, w, 2 * NUM_POINTS), np.float32)
        ref = np.zeros((h, w, 2 * NUM_POINTS), np.float32)
        levels.append([cls, init, ref])

    # gt_lvl = trunc((log2(32/4)+log2(48/4))/2) = 3 = log2(8) -> the
    # stride-8 level (index 0); its nearest point there is the grid argmin
    li = 0
    s = strides[li]
    h, w = shapes[li]
    ctr = np.asarray(_centers(shapes)[li]).reshape(h, w, 2)
    gcx, gcy = 36.0, 48.0
    d = (ctr[..., 0] - gcx) ** 2 + (ctr[..., 1] - gcy) ** 2
    iy, ix = np.unravel_index(np.argmin(d), (h, w))
    # offsets (stride units): mean -> gt center, std*stride -> half extents
    off_y = (gcy - ctr[iy, ix, 1]) / s
    off_x = (gcx - ctr[iy, ix, 0]) / s
    pts = base.copy()
    pts[:, 0] = base[:, 0] / s_b[0] * (24.0 / s) + off_y  # dy: half-h 24
    pts[:, 1] = base[:, 1] / s_b[1] * (16.0 / s) + off_x  # dx: half-w 16
    levels[li][1][iy, ix] = pts.reshape(-1)

    # sanity: the crafted points decode exactly to the gt box
    dec = np.asarray(points_to_boxes(
        jnp.asarray(pts.reshape(1, -1)),
        jnp.asarray(ctr[iy, ix][None]), float(s)))
    np.testing.assert_allclose(dec[0], gt[0], atol=1e-3)

    outs = [tuple(jnp.asarray(a) for a in lvl) for lvl in levels]
    loss = reppoints_loss(outs, jnp.asarray(gt), gt_labels, gt_valid, num_c)
    assert float(loss.loss_pts_init) < 1e-6
    assert np.isfinite(float(loss.loss_cls))
    assert np.isfinite(float(loss.loss_pts_refine))
