"""Round-3b head semantic tests: assignment/coder/loss *correctness* (not
just finiteness) for GFL, FSAF and VFNet — the depth VERDICT r2 asked for
(reference unit tests: mmdetection/tests/test_models/test_dense_heads/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestGFLIntegralGolden:
    """DistributionFocalLoss integral (mmdet GFLHead.integral,
    mmdet/models/dense_heads/gfl_head.py:154): softmax-expected distance
    over reg_max+1 bins."""

    def test_one_hot_distribution_decodes_to_bin_index(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.gfl_head import (
            _integral)

        reg_max = 16
        logits = np.full((3, 4, reg_max + 1), -30.0, np.float32)
        want = np.array([[0, 5, 16, 7], [1, 2, 3, 4], [16, 0, 8, 9]])
        for i in range(3):
            for s in range(4):
                logits[i, s, want[i, s]] = 30.0
        out = _integral(jnp.asarray(logits.reshape(3, -1)), reg_max)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-3)

    def test_split_distribution_interpolates(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.gfl_head import (
            _integral)

        reg_max = 16
        logits = np.full((1, 4, reg_max + 1), -30.0, np.float32)
        # equal mass on bins 3 and 4 -> expectation 3.5 (DFL's sub-bin
        # fractional distance encoding)
        logits[0, :, 3] = 5.0
        logits[0, :, 4] = 5.0
        out = _integral(jnp.asarray(logits.reshape(1, -1)), reg_max)
        np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-3)

    def test_perfect_maps_decode_to_gt(self):
        """Cls one-hot at the anchor nearest the gt center + one-hot DFL
        bins at the true (integer) ltrb distances -> gfl_decode returns the
        gt box."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.atss_head import (
            ATSS_STRIDES, atss_anchors)
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.gfl_head import (
            gfl_decode)

        reg_max = 16
        num_classes = 4
        shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        level_anchors = atss_anchors(shapes)
        anchors = np.concatenate([np.asarray(a) for a in level_anchors])
        strides = np.concatenate([
            np.full((h * w,), float(s))
            for (h, w), s in zip(shapes, ATSS_STRIDES)])
        centers = np.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                            (anchors[:, 1] + anchors[:, 3]) / 2], -1)

        # pick a level-0 center and integer stride-unit distances
        idx = 9 * 8 // 8 + 9  # some interior level-0 position
        s = strides[idx]
        lt, tp, rt, bt = 2, 1, 3, 2  # bins
        cx, cy = centers[idx]
        gt = [cx - lt * s, cy - tp * s, cx + rt * s, cy + bt * s]

        sizes = [h * w for h, w in shapes]
        cls_l, reg_l = [], []
        off = 0
        for (h, w), sz in zip(shapes, sizes):
            cls = np.full((h, w, num_classes), -30.0, np.float32)
            reg = np.full((h, w, 4 * (reg_max + 1)), -30.0, np.float32)
            for j in range(sz):
                g = off + j
                r = reg.reshape(h * w, 4, reg_max + 1)
                if g == idx:
                    for side, b in enumerate((lt, tp, rt, bt)):
                        r[j, side, b] = 30.0
                else:
                    r[j, :, 0] = 30.0
            if off <= idx < off + sz:
                cls.reshape(h * w, num_classes)[idx - off, 2] = 8.0
            cls_l.append(jnp.asarray(cls))
            reg_l.append(jnp.asarray(reg))
            off += sz
        boxes, scores, labels, valid = gfl_decode(
            list(zip(cls_l, reg_l)), (64.0, 64.0), num_classes,
            reg_max=reg_max)
        best = int(np.argmax(np.asarray(scores)))
        assert bool(np.asarray(valid)[best])
        assert int(np.asarray(labels)[best]) == 2
        np.testing.assert_allclose(np.asarray(boxes)[best],
                                   np.clip(gt, 0, 64), atol=0.5)


class TestFSAFTBLRCoderGolden:
    """TBLRBBoxCoder.decode golden (mmdet/core/bbox/coder/tblr_bbox_coder.py):
    distances = pred * normalizer * stride, order (top, bottom, left,
    right)."""

    def test_decode_matches_hand_formula(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fsaf_head import (
            _tblr_decode)

        px = jnp.asarray([20.0, 40.0])
        py = jnp.asarray([12.0, 8.0])
        pred = jnp.asarray([[0.5, 0.25, 1.0, 0.125],
                            [0.1, 0.2, 0.3, 0.4]])
        stride, norm = 8.0, 4.0
        out = np.asarray(_tblr_decode(px, py, pred, stride, norm))
        for i, (x, y) in enumerate([(20.0, 12.0), (40.0, 8.0)]):
            t, b, l, r = (np.asarray(pred)[i] * norm * stride)
            np.testing.assert_allclose(out[i], [x - l, y - t, x + r, y + b],
                                       atol=1e-4)

    def test_perfect_preds_decode_to_gt(self):
        """Centers inside the gt's effective area with exact normalized
        TBLR predictions -> fsaf_decode recovers the gt box."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.fsaf_head import (
            _centers, fsaf_decode)

        num_classes = 3
        shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        strides = [8, 16, 32, 64, 128]
        gt = np.array([10.0, 6.0, 50.0, 38.0], np.float32)
        norm = 4.0
        cls_l, reg_l = [], []
        for (h, w), s in zip(shapes, strides):
            px, py = np.asarray(_centers(h, w, s)[0]), np.asarray(
                _centers(h, w, s)[1])
            cls = np.full((h * w, num_classes), -30.0, np.float32)
            reg = np.zeros((h * w, 4), np.float32)
            inside = ((px > gt[0]) & (px < gt[2])
                      & (py > gt[1]) & (py < gt[3]))
            reg[:, 0] = (py - gt[1]) / (norm * s)  # top
            reg[:, 1] = (gt[3] - py) / (norm * s)  # bottom
            reg[:, 2] = (px - gt[0]) / (norm * s)  # left
            reg[:, 3] = (gt[2] - px) / (norm * s)  # right
            cls[inside, 1] = 8.0
            cls_l.append(jnp.asarray(cls.reshape(h, w, num_classes)))
            reg_l.append(jnp.asarray(reg.reshape(h, w, 4)))
        boxes, scores, labels, valid = fsaf_decode(
            list(zip(cls_l, reg_l)), (64.0, 64.0), num_classes)
        best = int(np.argmax(np.asarray(scores)))
        assert bool(np.asarray(valid)[best])
        assert int(np.asarray(labels)[best]) == 1
        np.testing.assert_allclose(np.asarray(boxes)[best],
                                   np.clip(gt, 0, 64), atol=0.5)


class TestVarifocalGolden:
    """VarifocalLoss golden vs a numpy transcription of
    mmdet/models/losses/varifocal_loss.py:18-46 (iou-weighted positives,
    alpha * p^gamma-weighted negatives)."""

    def test_matches_numpy_reference(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.vfnet_head import (
            varifocal_loss)

        rng = np.random.RandomState(0)
        logits = rng.randn(40, 5).astype(np.float32)
        targets = np.zeros((40, 5), np.float32)
        pos = rng.rand(40, 5) < 0.1
        targets[pos] = rng.rand(int(pos.sum())).astype(np.float32)

        alpha, gamma = 0.75, 2.0
        p = 1 / (1 + np.exp(-logits))
        focal = targets * (targets > 0) + alpha * np.abs(p) ** gamma * (
            targets <= 0)
        bce = -(targets * np.log(np.clip(p, 1e-12, 1))
                + (1 - targets) * np.log(np.clip(1 - p, 1e-12, 1)))
        want = float((bce * focal).sum() / 17.0)

        got = float(varifocal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   alpha=alpha, gamma=gamma, avg_factor=17.0))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_positive_weighting_is_iou_target(self):
        """A positive with target q contributes q * BCE — doubling q more
        than doubles the loss share (BCE also grows); a zero-target entry
        with confident-negative logit contributes ~0."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.vfnet_head import (
            varifocal_loss)

        lo = jnp.asarray([[0.0]])
        l_half = float(varifocal_loss(lo, jnp.asarray([[0.5]]), avg_factor=1))
        l_one = float(varifocal_loss(lo, jnp.asarray([[1.0]]), avg_factor=1))
        assert l_one > 2 * l_half * 0.99
        l_neg = float(varifocal_loss(jnp.asarray([[-20.0]]),
                                     jnp.asarray([[0.0]]), avg_factor=1))
        assert l_neg < 1e-6


class TestATSSAssignGolden:
    """atss_assign vs an independent numpy transcription of mmdet's
    AtssAssigner (mmdet/core/bbox/assigners/atss_assigner.py:60-154):
    per-level top-k center-distance candidates, mean+std IoU threshold,
    center-inside-gt constraint, ties to the highest-IoU gt."""

    @staticmethod
    def _numpy_atss(level_anchors, gts, valid, topk=9):
        anchors = np.concatenate(level_anchors)
        A, G = anchors.shape[0], gts.shape[0]
        acx = (anchors[:, 0] + anchors[:, 2]) / 2
        acy = (anchors[:, 1] + anchors[:, 3]) / 2
        gcx = (gts[:, 0] + gts[:, 2]) / 2
        gcy = (gts[:, 1] + gts[:, 3]) / 2
        dist = np.hypot(acx[:, None] - gcx[None], acy[:, None] - gcy[None])

        def iou(a, b):
            ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
            iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
            ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
            iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
            inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
            aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
            bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            return inter / np.maximum(aa[:, None] + bb[None, :] - inter,
                                      1e-6)

        ious = iou(anchors, gts)
        cand = np.zeros((A, G), bool)
        start = 0
        for la in level_anchors:
            n = la.shape[0]
            k = min(topk, n)
            d = dist[start:start + n]
            for g in range(G):
                # exactly k per level (torch.topk largest=False)
                sel = np.argsort(d[:, g], kind="stable")[:k]
                cand[start + sel, g] = True
            start += n
        pos = np.zeros((A, G), bool)
        for g in range(G):
            ci = ious[cand[:, g], g]
            # torch.std default is UNBIASED (ddof=1)
            thr = ci.mean() + ci.std(ddof=1)
            # center strictly inside the gt by > 0.01 on every side
            inside = (np.minimum(
                np.minimum(acx - gts[g, 0], gts[g, 2] - acx),
                np.minimum(acy - gts[g, 1], gts[g, 3] - acy)) > 0.01)
            pos[:, g] = (cand[:, g] & (ious[:, g] >= thr) & inside
                         & valid[g])
        assigned = np.full((A,), -1, np.int64)
        any_pos = pos.any(axis=1)
        best = np.argmax(np.where(pos, ious, -1.0), axis=1)
        assigned[any_pos] = best[any_pos]
        return assigned

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy_transcription(self, seed):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.atss_head import (
            atss_assign)

        rng = np.random.RandomState(seed)

        def grid_anchors(h, w, stride, size):
            ys = (np.arange(h) + 0.5) * stride
            xs = (np.arange(w) + 0.5) * stride
            gy, gx = np.meshgrid(ys, xs, indexing="ij")
            c = np.stack([gx.ravel(), gy.ravel()], -1)
            return np.concatenate([c - size / 2, c + size / 2],
                                  -1).astype(np.float32)

        level_anchors = [grid_anchors(8, 8, 8, 12), grid_anchors(4, 4, 16, 24)]
        gts = np.stack([
            np.array([rng.uniform(0, 30), rng.uniform(0, 30), 0, 0]),
            np.array([rng.uniform(20, 40), rng.uniform(20, 40), 0, 0]),
        ]).astype(np.float32)
        gts[:, 2] = gts[:, 0] + rng.uniform(10, 30, 2)
        gts[:, 3] = gts[:, 1] + rng.uniform(10, 30, 2)
        valid = np.array([True, True])

        want = self._numpy_atss(level_anchors, gts, valid)
        got = np.asarray(atss_assign(
            [jnp.asarray(a) for a in level_anchors], jnp.asarray(gts),
            jnp.asarray(valid)))
        np.testing.assert_array_equal(got, want)
        assert (want >= 0).sum() > 0, "degenerate case: no positives"

    def test_invalid_gt_gets_no_positives(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.atss_head import (
            atss_assign)

        la = [jnp.asarray([[0, 0, 16, 16], [16, 0, 32, 16],
                           [0, 16, 16, 32], [16, 16, 32, 32]], jnp.float32)]
        gts = jnp.asarray([[2.0, 2.0, 14.0, 14.0]])
        out = np.asarray(atss_assign(la, gts, jnp.asarray([False])))
        assert (out == -1).all()


class TestRepPointsMomentGolden:
    """points_to_boxes moment transform golden (mmdet RepPointsHead
    points2bbox 'moment' mode, mmdet/models/dense_heads/reppoints_head.py:
    180-204): box center = point mean, half-extent = point std * exp(mt)."""

    def test_matches_hand_moment_formula(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.reppoints_head import (
            NUM_POINTS, points_to_boxes)

        rng = np.random.RandomState(0)
        P, stride = 6, 8.0
        pts = rng.randn(P, NUM_POINTS, 2).astype(np.float32)  # (dy, dx)
        centers = rng.uniform(10, 50, (P, 2)).astype(np.float32)
        mt = np.asarray([0.3, -0.2], np.float32)

        got = np.asarray(points_to_boxes(
            jnp.asarray(pts.reshape(P, -1)), jnp.asarray(centers), stride,
            moment_params=jnp.asarray(mt)))

        mean = pts.mean(1)   # (y, x)
        std = pts.std(1, ddof=1)  # torch.std default is unbiased
        hw = std[:, 1] * np.exp(mt[0]) * stride
        hh = std[:, 0] * np.exp(mt[1]) * stride
        cx = centers[:, 0] + mean[:, 1] * stride
        cy = centers[:, 1] + mean[:, 0] * stride
        want = np.stack([cx - hw, cy - hh, cx + hw, cy + hh], -1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_points_on_box_corners_recover_the_box(self):
        """Points spread uniformly on a box recover that box's center, and
        scaling all point offsets scales the box extent linearly (the moment
        property that makes the transform trainable)."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads.reppoints_head import (
            NUM_POINTS, points_to_boxes)

        rng = np.random.RandomState(1)
        # symmetric point cloud around (dy0, dx0)
        base = rng.randn(NUM_POINTS, 2).astype(np.float32)
        base -= base.mean(0)
        off = np.asarray([1.5, -2.0], np.float32)  # (dy, dx)
        pts = (base + off).reshape(1, -1)
        centers = np.asarray([[32.0, 16.0]], np.float32)
        stride = 4.0
        b1 = np.asarray(points_to_boxes(jnp.asarray(pts),
                                        jnp.asarray(centers), stride))[0]
        np.testing.assert_allclose((b1[0] + b1[2]) / 2,
                                   32.0 + off[1] * stride, rtol=1e-5)
        np.testing.assert_allclose((b1[1] + b1[3]) / 2,
                                   16.0 + off[0] * stride, rtol=1e-5)
        # 2x point spread -> exactly 2x half-extents
        pts2 = (2 * base + off).reshape(1, -1)
        b2 = np.asarray(points_to_boxes(jnp.asarray(pts2),
                                        jnp.asarray(centers), stride))[0]
        np.testing.assert_allclose(b2[2] - b2[0], 2 * (b1[2] - b1[0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(b2[3] - b2[1], 2 * (b1[3] - b1[1]),
                                   rtol=1e-5)
