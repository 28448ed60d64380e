"""Grid R-CNN exact grid head goldens (VERDICT r3 #4).

Three layers of evidence against
mmdetection/mmdet/models/roi_heads/mask_heads/grid_head.py:

1. ``test_gdeconv_equals_torch_conv_transpose`` — the flax grouped
   dilated-conv formulation of the 4x4/s2/p1 grouped ConvTranspose2d equals
   torch's F.conv_transpose2d under the flip+regroup weight mapping.
2. ``test_forward_matches_torch_transcription`` — the FULL head forward
   (8 GN convs, first/second-order neighbor fusion with 5x5 depthwise + 1x1
   transitions in the reference's column-major point order, shared grouped
   deconv stack, fused + unfused outputs) equals a plain-torch transcription
   of grid_head.forward with the SAME weights.
3. ``test_targets_match_transcription`` / ``test_decode_matches_transcription``
   — get_targets (2x expansion, int-truncated circle centers, per-point
   sub-region crops, small-box ignore) and get_bboxes (per-point argmax,
   sub-region lift, expanded-frame mapping, score-weighted boundary voting,
   border clamp) equal direct numpy transcriptions on random fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.more_rcnn import (
    GRID_HALF,
    GRID_NEIGHBORS,
    GRID_POINTS,
    GRID_SIZE,
    GRID_SUBS,
    GRID_WHOLE,
    GridHead,
    grid_points_decode,
    grid_targets,
)


def _flax_deconv_to_torch(w_hwio, groups):
    """HWIO dilated-correlation kernel -> torch ConvTranspose2d weight
    [cin, cout/groups, kh, kw] (spatial flip + per-group regroup)."""
    kh, kw, cing, cout = w_hwio.shape
    cin = cing * groups
    coutg = cout // groups
    wt = np.zeros((cin, coutg, kh, kw), np.float32)
    for i in range(cin):
        g, il = divmod(i, cing)
        for ol in range(coutg):
            wt[i, ol] = w_hwio[::-1, ::-1, il, g * coutg + ol]
    return wt


def test_gdeconv_equals_torch_conv_transpose():
    rs = np.random.RandomState(0)
    g, cing, coutg = 9, 4, 3
    x = rs.randn(2, 7, 7, g * cing).astype(np.float32)
    w = rs.randn(4, 4, cing, g * coutg).astype(np.float32)
    b = rs.randn(g * coutg).astype(np.float32)
    got = np.asarray(GridHead._gdeconv(jnp.asarray(x),
                                       (jnp.asarray(w), jnp.asarray(b))))
    wt = torch.from_numpy(_flax_deconv_to_torch(w, g))
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), wt,
        torch.from_numpy(b), stride=2, padding=1, groups=g)
    np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    assert got.shape == (2, 14, 14, g * coutg)


def _torch_grid_forward(params, x_nhwc, c):
    """Plain-torch transcription of grid_head.forward with flax weights."""
    p = params["params"]
    co = c * GRID_POINTS
    x = torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    for i in range(8):
        w = torch.from_numpy(
            np.asarray(p[f"conv{i}"]["kernel"]).transpose(3, 2, 0, 1))
        b = torch.from_numpy(np.asarray(p[f"conv{i}"]["bias"]))
        x = F.conv2d(x, w, b, stride=2 if i == 0 else 1, padding=1)
        x = F.group_norm(
            x, 36, torch.from_numpy(np.asarray(p[f"gn{i}"]["scale"])),
            torch.from_numpy(np.asarray(p[f"gn{i}"]["bias"])), eps=1e-5)
        x = x.relu()

    def trans(t, name):
        dw = torch.from_numpy(
            np.asarray(p[f"{name}_dw"]["kernel"]).transpose(3, 2, 0, 1))
        dwb = torch.from_numpy(np.asarray(p[f"{name}_dw"]["bias"]))
        t = F.conv2d(t, dw, dwb, padding=2, groups=c)
        pw = torch.from_numpy(
            np.asarray(p[f"{name}_pw"]["kernel"]).transpose(3, 2, 0, 1))
        pwb = torch.from_numpy(np.asarray(p[f"{name}_pw"]["bias"]))
        return F.conv2d(t, pw, pwb)

    def pt(t, i):
        return t[:, i * c:(i + 1) * c]

    # first-order fusion (grid_head.py:157-163)
    x_fo = []
    for i, nbrs in enumerate(GRID_NEIGHBORS):
        acc = pt(x, i)
        for j, pidx in enumerate(nbrs):
            acc = acc + trans(pt(x, pidx), f"fo{i}_{j}")
        x_fo.append(acc)
    # second-order fusion (:166-170)
    x_so = []
    for i, nbrs in enumerate(GRID_NEIGHBORS):
        acc = pt(x, i)
        for j, pidx in enumerate(nbrs):
            acc = acc + trans(x_fo[pidx], f"so{i}_{j}")
        x_so.append(acc)

    d1w = torch.from_numpy(_flax_deconv_to_torch(
        np.asarray(p["deconv1_w"]), GRID_POINTS))
    d1b = torch.from_numpy(np.asarray(p["deconv1_b"]))
    d2w = torch.from_numpy(_flax_deconv_to_torch(
        np.asarray(p["deconv2_w"]), GRID_POINTS))
    d2b = torch.from_numpy(np.asarray(p["deconv2_b"]))
    gnw = torch.from_numpy(np.asarray(p["gn_deconv"]["scale"]))
    gnb = torch.from_numpy(np.asarray(p["gn_deconv"]["bias"]))

    def run(feat):
        y = F.conv_transpose2d(feat, d1w, d1b, stride=2, padding=1,
                               groups=GRID_POINTS)
        y = F.group_norm(y, GRID_POINTS, gnw, gnb, eps=1e-5).relu()
        return F.conv_transpose2d(y, d2w, d2b, stride=2, padding=1,
                                  groups=GRID_POINTS)

    fused = run(torch.cat(x_so, dim=1))
    unfused = run(x)
    return (fused.numpy().transpose(0, 2, 3, 1),
            unfused.numpy().transpose(0, 2, 3, 1))


def test_forward_matches_torch_transcription():
    c = 8  # c*9=72 divisible by 36 — keeps the GN(36) structure at test size
    head = GridHead(point_channels=c)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 14, 14, 16).astype(np.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    # randomize: init deconvs are ~0 which would mask fusion-order bugs
    leaves, tree = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        tree, [jnp.asarray(rs.randn(*l.shape), jnp.float32) * 0.1
               for l in leaves])
    fused, unfused = head.apply(params, jnp.asarray(x), True)
    with torch.no_grad():
        tf, tu = _torch_grid_forward(params, x, c)
    assert fused.shape == (2, GRID_HALF, GRID_HALF, GRID_POINTS)
    np.testing.assert_allclose(np.asarray(fused), tf, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(unfused), tu, rtol=1e-3, atol=1e-4)
    # fused != unfused: the fusion path is live
    assert float(np.abs(np.asarray(fused) - tu).max()) > 1e-4


def _np_grid_targets(pos, gt, radius=1):
    """Direct numpy transcription of grid_head.get_targets (:221-284)."""
    n = pos.shape[0]
    x1 = pos[:, 0] - (pos[:, 2] - pos[:, 0]) / 2
    y1 = pos[:, 1] - (pos[:, 3] - pos[:, 1]) / 2
    x2 = pos[:, 2] + (pos[:, 2] - pos[:, 0]) / 2
    y2 = pos[:, 3] + (pos[:, 3] - pos[:, 1]) / 2
    ws, hs = x2 - x1, y2 - y1
    ms = GRID_WHOLE
    targets = np.zeros((n, GRID_POINTS, ms, ms), np.float32)
    factors = [(1 - (j // GRID_SIZE) / (GRID_SIZE - 1),
                1 - (j % GRID_SIZE) / (GRID_SIZE - 1))
               for j in range(GRID_POINTS)]
    for i in range(n):
        if ws[i] <= GRID_SIZE or hs[i] <= GRID_SIZE:
            continue
        for j in range(GRID_POINTS):
            fx, fy = factors[j]
            gx = fx * gt[i, 0] + (1 - fx) * gt[i, 2]
            gy = fy * gt[i, 1] + (1 - fy) * gt[i, 3]
            cx = int((gx - x1[i]) / ws[i] * ms)
            cy = int((gy - y1[i]) / hs[i] * ms)
            for xx in range(cx - radius, cx + radius + 1):
                for yy in range(cy - radius, cy + radius + 1):
                    if 0 <= xx < ms and 0 <= yy < ms:
                        if (xx - cx) ** 2 + (yy - cy) ** 2 <= radius ** 2:
                            targets[i, j, yy, xx] = 1
    subs = []
    for j in range(GRID_POINTS):
        sx, sy = GRID_SUBS[j]
        subs.append(targets[:, [j], sy:sy + GRID_HALF, sx:sx + GRID_HALF])
    return np.concatenate(subs, axis=1)  # [n, 9, 28, 28]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_targets_match_transcription(seed):
    rs = np.random.RandomState(seed)
    n = 12
    cx = rs.uniform(30, 200, n)
    cy = rs.uniform(30, 200, n)
    w = rs.uniform(2.0, 60, n)  # includes sub-grid-size "ignore" rois
    h = rs.uniform(2.0, 60, n)
    pos = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                   -1).astype(np.float32)
    gt = pos + rs.uniform(-6, 6, (n, 4)).astype(np.float32)
    gt = np.stack([np.minimum(gt[:, 0], gt[:, 2]) - 1,
                   np.minimum(gt[:, 1], gt[:, 3]) - 1,
                   np.maximum(gt[:, 0], gt[:, 2]) + 1,
                   np.maximum(gt[:, 1], gt[:, 3]) + 1], -1)
    want = _np_grid_targets(pos, gt)
    got = np.asarray(grid_targets(jnp.asarray(pos), jnp.asarray(gt)))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)
    assert want.sum() > 0


def _np_grid_decode(heat, boxes, img_shape):
    """Direct numpy transcription of grid_head.get_bboxes (:295-359)."""
    n = heat.shape[0]
    probs = 1 / (1 + np.exp(-heat))  # [n, 28, 28, 9]
    out = np.zeros((n, 4), np.float32)
    for i in range(n):
        xs, ys, sc = [], [], []
        for j in range(GRID_POINTS):
            hm = probs[i, :, :, j]
            idx = int(hm.argmax())
            yy, xx = divmod(idx, GRID_HALF)
            sx, sy = GRID_SUBS[j]
            xs.append(xx + sx)
            ys.append(yy + sy)
            sc.append(hm.max())
        xs, ys, sc = np.asarray(xs, float), np.asarray(ys, float), np.asarray(sc)
        wdt = boxes[i, 2] - boxes[i, 0]
        hgt = boxes[i, 3] - boxes[i, 1]
        x1e = boxes[i, 0] - wdt / 2
        y1e = boxes[i, 1] - hgt / 2
        ax = (xs + 0.5) / GRID_HALF * wdt + x1e
        ay = (ys + 0.5) / GRID_HALF * hgt + y1e
        x1i, y1i = [0, 1, 2], [0, 3, 6]
        x2i, y2i = [6, 7, 8], [2, 5, 8]
        vote = lambda v, idxs: (v[idxs] * sc[idxs]).sum() / sc[idxs].sum()
        out[i] = [vote(ax, x1i), vote(ay, y1i), vote(ax, x2i), vote(ay, y2i)]
    out[:, 0::2] = out[:, 0::2].clip(0, img_shape[1])
    out[:, 1::2] = out[:, 1::2].clip(0, img_shape[0])
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_decode_matches_transcription(seed):
    rs = np.random.RandomState(seed)
    n = 16
    heat = rs.randn(n, GRID_HALF, GRID_HALF, GRID_POINTS).astype(np.float32)
    cx = rs.uniform(40, 200, n)
    cy = rs.uniform(40, 160, n)
    w = rs.uniform(10, 80, n)
    h = rs.uniform(10, 80, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    want = _np_grid_decode(heat, boxes, (224, 256))
    got = np.asarray(grid_points_decode(jnp.asarray(heat),
                                        jnp.asarray(boxes), (224, 256)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_decode_peak_roundtrip():
    """A gt box rendered as targets then decoded recovers the gt borders to
    within one whole-map cell of the expanded roi."""
    box = np.asarray([[40.0, 32.0, 120.0, 96.0]], np.float32)
    gt = np.asarray([[44.0, 38.0, 112.0, 90.0]], np.float32)
    tgt = np.asarray(grid_targets(jnp.asarray(box), jnp.asarray(gt)))
    heat = np.where(tgt > 0, 30.0, -30.0).astype(np.float32)
    dec = np.asarray(grid_points_decode(jnp.asarray(heat),
                                        jnp.asarray(box), (224, 256)))[0]
    cell = 2 * (box[0, 2] - box[0, 0]) / GRID_WHOLE  # whole-map cell in px
    np.testing.assert_allclose(dec, gt[0], atol=float(cell) + 1e-3)
