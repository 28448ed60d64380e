"""Golden-value tests for box geometry, anchors, assigner, sampler, NMS.

Golden values are transcribed from the reference's documented examples
(mmdet delta_xywh_bbox_coder.py docstring, anchor_generator.py docstring) or
recomputed by hand — never by running reference code here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlightenvironmentvideoobjectdetection_tpu.core import (
    AnchorGenerator,
    bbox2delta,
    bbox_overlaps,
    delta2bbox,
    max_iou_assign,
    multiclass_nms,
    nms_fixed,
    random_sample_gather,
    random_sample_masks,
)


class TestBoxes:
    def test_iou_simple(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
        b = jnp.array([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 110.0, 110.0]])
        iou = bbox_overlaps(a, b)
        np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)
        # overlap 5x5=25, union 100+100-25=175
        np.testing.assert_allclose(iou[1, 0], 25.0 / 175.0, rtol=1e-5)

    def test_iof(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.array([[0.0, 0.0, 5.0, 10.0]])
        iof = bbox_overlaps(a, b, mode="iof")
        np.testing.assert_allclose(iof[0, 0], 0.5, rtol=1e-5)

    def test_delta_roundtrip(self):
        rng = np.random.RandomState(0)
        props = rng.uniform(0, 100, (32, 4)).astype(np.float32)
        props[:, 2:] += props[:, :2] + 1.0
        gts = rng.uniform(0, 100, (32, 4)).astype(np.float32)
        gts[:, 2:] += gts[:, :2] + 1.0
        means, stds = (0.1, 0.2, 0.3, 0.4), (0.5, 1.0, 2.0, 4.0)
        deltas = bbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
        rec = delta2bbox(jnp.asarray(props), deltas, means, stds)
        np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-3, atol=1e-2)

    def test_delta2bbox_golden(self):
        # Docstring example of mmdet delta2bbox (delta_xywh_bbox_coder.py:175-185).
        rois = jnp.array(
            [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0],
             [5.0, 5.0, 5.0, 5.0]]
        )
        deltas = jnp.array(
            [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 2.0, -1.0],
             [0.7, -1.9, -0.5, 0.3]]
        )
        out = delta2bbox(rois, deltas, max_shape=(32, 32))
        expected = np.array(
            [[0.0, 0.0, 1.0, 1.0],
             [0.1409, 0.1409, 2.8591, 2.8591],
             [0.0, 0.3161, 4.1945, 0.6839],
             [5.0, 5.0, 5.0, 5.0]]
        )
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3)


class TestAnchors:
    def test_base_anchor_golden(self):
        # Docstring example of mmdet AnchorGenerator (anchor_generator.py:40-49).
        gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[1.0], base_sizes=[9])
        anchors = gen.grid_anchors([(2, 2)])[0]
        expected = np.array(
            [[-4.5, -4.5, 4.5, 4.5],
             [11.5, -4.5, 20.5, 4.5],
             [-4.5, 11.5, 4.5, 20.5],
             [11.5, 11.5, 20.5, 20.5]]
        )
        np.testing.assert_allclose(anchors, expected)

    def test_rpn_dc5_anchor_shapes(self):
        # canonical VID config: scales [4,8,16,32], ratios [.5,1,2], stride 16
        gen = AnchorGenerator(strides=[16], ratios=[0.5, 1.0, 2.0], scales=[4, 8, 16, 32])
        assert gen.num_base_anchors == 12
        a = gen.grid_anchors([(38, 63)])[0]
        assert a.shape == (38 * 63 * 12, 4)
        # ratio=1, scale=4 anchor is 64x64 centered at 0
        base = gen.base_anchors(0)
        ws = base[:, 2] - base[:, 0]
        hs = base[:, 3] - base[:, 1]
        areas = ws * hs
        np.testing.assert_allclose(areas[:4], (16 * np.array([4, 8, 16, 32])) ** 2, rtol=1e-5)
        # ratio 0.5 -> h/w = 0.5... reference: h_ratios=sqrt(ratio), w=1/sqrt
        np.testing.assert_allclose(hs[:4] / ws[:4], 0.5, rtol=1e-5)

    def test_valid_flags(self):
        gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[8])
        flags = gen.valid_flags([(4, 4)], pad_shape=(33, 64))
        f = flags[0].reshape(4, 4)
        assert f[:3].all() and not f[3].any()


class TestAssigner:
    def _setup(self):
        anchors = jnp.array(
            [[0, 0, 10, 10], [0, 0, 20, 20], [50, 50, 60, 60], [100, 100, 110, 110]],
            jnp.float32,
        )
        gts = jnp.array([[0, 0, 10, 10], [50, 50, 62, 60]], jnp.float32)
        labels = jnp.array([3, 5], jnp.int32)
        valid = jnp.array([True, True])
        return anchors, gts, labels, valid

    def test_basic_assign(self):
        anchors, gts, labels, valid = self._setup()
        res = max_iou_assign(anchors, gts, labels, valid, 0.7, 0.3, 0.3)
        assert int(res.assigned_gt_inds[0]) == 1  # IoU=1 with gt0
        assert int(res.assigned_gt_inds[3]) == 0  # no overlap -> negative
        assert int(res.labels[0]) == 3
        # anchor2 has IoU 100/120 = .83 with gt1 -> positive
        assert int(res.assigned_gt_inds[2]) == 2
        assert int(res.labels[2]) == 5

    def test_low_quality_match(self):
        anchors = jnp.array([[0, 0, 10, 10], [40, 40, 80, 80]], jnp.float32)
        gts = jnp.array([[41, 41, 79, 120]], jnp.float32)  # IoU < .7 with both
        labels = jnp.array([2], jnp.int32)
        res = max_iou_assign(
            anchors, gts, labels, jnp.array([True]), 0.7, 0.3, min_pos_iou=0.3
        )
        # anchor1 is gt0's best anchor with IoU >= .3 -> claimed despite < pos_thr
        assert int(res.assigned_gt_inds[1]) == 1

    def test_padded_gt_ignored(self):
        anchors, gts, labels, _ = self._setup()
        valid = jnp.array([True, False])
        res = max_iou_assign(anchors, gts, labels, valid, 0.7, 0.3, 0.3)
        assert int(res.assigned_gt_inds[2]) == 0  # gt1 invalid -> negative


class TestSampler:
    def test_mask_sampler_quota(self):
        n = 1000
        rng = np.random.RandomState(1)
        assigned = jnp.asarray(
            rng.choice([0, 0, 0, 0, 0, 0, 1, 2], size=n).astype(np.int32)
        )
        from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import AssignResult

        res = AssignResult(assigned, jnp.zeros(n), jnp.zeros(n, jnp.int32))
        masks = random_sample_masks(res, jax.random.PRNGKey(0), num=256, pos_fraction=0.5)
        n_pos = int(masks.pos_mask.sum())
        n_neg = int(masks.neg_mask.sum())
        assert n_pos <= 128
        assert n_pos + n_neg == 256
        # sampled positives must actually be positives
        assert bool(jnp.all(assigned[masks.pos_mask] > 0))
        assert bool(jnp.all(assigned[masks.neg_mask] == 0))

    def test_mask_sampler_few_pos(self):
        assigned = jnp.array([1] * 3 + [0] * 500, jnp.int32)
        from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import AssignResult

        res = AssignResult(assigned, jnp.zeros(503), jnp.zeros(503, jnp.int32))
        masks = random_sample_masks(res, jax.random.PRNGKey(0), 256, 0.5)
        assert int(masks.pos_mask.sum()) == 3
        assert int(masks.neg_mask.sum()) == 253

    def test_gather_sampler(self):
        assigned = jnp.array([1, 2, 0, 0, 0, 0, -1, -1], jnp.int32)
        from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import AssignResult

        res = AssignResult(assigned, jnp.zeros(8), jnp.zeros(8, jnp.int32))
        s = random_sample_gather(res, jax.random.PRNGKey(2), num=4, pos_fraction=0.5)
        assert s.inds.shape == (4,)
        assert int(s.is_pos.sum()) == 2
        assert bool(s.is_valid.all())
        picked = np.asarray(assigned)[np.asarray(s.inds)]
        assert (picked >= 0).all()  # never samples ignored (-1) boxes


class TestNMS:
    def test_nms_basic(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.95])
        res = nms_fixed(boxes, scores, iou_threshold=0.5, max_out=4)
        kept = np.asarray(res.inds)[np.asarray(res.valid)]
        # box3 (score .95) suppresses box0 and box1; box2 survives
        assert list(kept) == [3, 2]

    def test_nms_validity_mask(self):
        boxes = jnp.array([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
        scores = jnp.array([0.9, 0.7])
        valid = jnp.array([True, False])
        res = nms_fixed(boxes, scores, 0.5, max_out=2, valid=valid)
        assert int(res.valid.sum()) == 1
        assert int(res.inds[0]) == 0

    def test_nms_jit_and_grad_free(self):
        f = jax.jit(lambda b, s: nms_fixed(b, s, 0.5, 8))
        boxes = jnp.asarray(np.random.RandomState(0).uniform(0, 100, (32, 4)), jnp.float32)
        boxes = boxes.at[:, 2:].set(boxes[:, :2] + 10.0)
        scores = jnp.asarray(np.random.RandomState(1).uniform(size=32), jnp.float32)
        res = f(boxes, scores)
        assert res.boxes.shape == (8, 4)

    def test_multiclass_nms(self):
        # two proposals, 3 classes (+bg)
        bboxes = jnp.array([[0, 0, 10, 10], [0.5, 0.5, 10, 10]], jnp.float32)
        scores = jnp.array(
            [[0.9, 0.01, 0.05, 0.04], [0.85, 0.6, 0.01, 0.01]], jnp.float32
        )
        res = multiclass_nms(bboxes, scores, score_thr=0.05, iou_threshold=0.5, max_num=5)
        v = np.asarray(res.valid)
        labs = np.asarray(res.labels)[v]
        scrs = np.asarray(res.scores)[v]
        # class0: the two boxes overlap > .5 -> keep only score .9;
        # class1: box1 score .6 kept (class offset isolates classes)
        assert sorted(labs.tolist()) == [0, 1]
        assert pytest.approx(sorted(scrs.tolist())) == [0.6, 0.9]

    def test_multiclass_nms_score_thr(self):
        bboxes = jnp.array([[0, 0, 10, 10]], jnp.float32)
        scores = jnp.array([[0.04, 0.96]], jnp.float32)  # 1 class + bg
        res = multiclass_nms(bboxes, scores, 0.05, 0.5, 3)
        assert int(res.valid.sum()) == 0
