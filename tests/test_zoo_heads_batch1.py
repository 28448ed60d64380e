"""Smoke tests for the round-2 dense-head families: FSAF, FoveaBox,
FreeAnchor, PAA (loss + decode, tiny shapes), mirroring
tests/test_more_detectors.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


def _gts():
    return (jnp.asarray([[8.0, 8.0, 60.0, 60.0], [0.0, 0.0, 0.0, 0.0]]),
            jnp.asarray([2, 0], jnp.int32), jnp.asarray([True, False]))


def _imgs(hw=128):
    return jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (1, hw, hw, 3)), jnp.float32)


class TestFSAF:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            fsaf_head as F,
        )

        model = F.FSAF(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        assert outs[0][0].shape == (1, 16, 16, 4)
        assert outs[0][1].shape == (1, 16, 16, 4)
        # reg branch is relu'd (TBLR must be positive)
        assert float(jnp.min(outs[0][1])) >= 0.0

        flat = [(c[0], r[0]) for c, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: F.fsaf_loss(f, gt_b, gt_l, gt_v, 4))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        assert float(loss.loss_cls) > 0

        det = jax.jit(lambda f: F.fsaf_decode(f, (128, 128), 4, nms_pre=100,
                                              max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_online_level_selection_prefers_one_level(self):
        """A gt has candidates on several levels; only ONE level's positives
        contribute to the reg loss (min-loss level selection)."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            fsaf_head as F,
        )

        # two levels of plausible size for a 64px gt at stride 8 and 16
        shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
        flat = [(jnp.zeros(s + (4,)), jnp.full(s + (4,), 0.5))
                for s in shapes]
        gt_b = jnp.asarray([[16.0, 16.0, 112.0, 112.0]])
        loss = F.fsaf_loss(flat, gt_b, jnp.asarray([1], jnp.int32),
                           jnp.asarray([True]), 4)
        assert np.isfinite(float(loss.loss_bbox))
        assert float(loss.loss_bbox) > 0


class TestFoveaBox:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            fovea_head as F,
        )

        model = F.FoveaBox(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        flat = [(c[0], r[0]) for c, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: F.fovea_loss(f, gt_b, gt_l, gt_v, 4))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: F.fovea_decode(f, (128, 128), 4, nms_pre=50,
                                               max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_fovea_center_assigned_smallest_gt_wins(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            fovea_head as F,
        )

        # level 1 (stride 16, scale range (16, 64)): gt of side ~48
        lab, tgt, pos = F.fovea_targets_level(
            8, 8, 16, 32, (16, 64),
            jnp.asarray([[32.0, 32.0, 80.0, 80.0],
                         [24.0, 24.0, 88.0, 88.0]]),
            jnp.asarray([1, 2], jnp.int32), jnp.asarray([True, True]), 4)
        assert bool(jnp.any(pos))
        # the center cell belongs to the SMALLER gt (label 1)
        center_idx = 3 * 8 + 3
        assert int(lab[center_idx]) == 1


class TestFreeAnchor:
    def test_loss_finite_and_positive(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            free_anchor_head as FA,
            retina_head as R,
        )

        model = R.RetinaNet(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        gen = R.retina_anchor_generator()
        shapes = [(o[0].shape[1], o[0].shape[2]) for o in outs]
        anchors = [jnp.asarray(a) for a in gen.grid_anchors(shapes)]
        flat = [(c[0], r[0]) for c, r in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: FA.free_anchor_loss(
            f, anchors, gt_b, gt_l, gt_v, 4, pre_anchor_topk=16))(flat)
        assert np.isfinite(float(loss.positive_bag_loss))
        assert np.isfinite(float(loss.negative_bag_loss))
        assert float(loss.positive_bag_loss) > 0

    def test_good_prediction_lowers_positive_loss(self):
        """An anchor stack whose cls prob at the gt label is high and whose
        deltas are exact should produce a much smaller positive bag loss."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            free_anchor_head as FA,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.core import (
            boxes as box_ops,
        )

        anchors = [jnp.asarray([[8.0, 8.0, 56.0, 56.0],
                                [0.0, 0.0, 16.0, 16.0]])]
        gt_b = jnp.asarray([[8.0, 8.0, 60.0, 60.0]])
        gt_l = jnp.asarray([1], jnp.int32)
        gt_v = jnp.asarray([True])
        tgt = box_ops.bbox2delta(anchors[0][:1], gt_b, stds=FA.STDS)

        def mk(cls_logit, good):
            cls = jnp.full((1, 2, 1 * 4), -8.0)
            cls = cls.at[0, 0, 1].set(cls_logit)
            reg = jnp.zeros((1, 2, 4))
            if good:
                reg = reg.at[0, 0].set(tgt[0])
            return [(cls.reshape(1, 2, 4), reg.reshape(1, 2, 4))]

        good = FA.free_anchor_loss(mk(6.0, True), anchors, gt_b, gt_l, gt_v,
                                   4, pre_anchor_topk=2)
        bad = FA.free_anchor_loss(mk(-6.0, False), anchors, gt_b, gt_l, gt_v,
                                  4, pre_anchor_topk=2)
        assert float(good.positive_bag_loss) < 0.2 * float(
            bad.positive_bag_loss)


class TestPAA:
    def test_forward_loss_decode(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            paa_head as P,
        )

        model = P.PAA(num_classes=4, dtype=jnp.float32)
        imgs = _imgs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
        outs = jax.jit(model.apply)(params, imgs)
        assert len(outs) == 5
        flat = [(c[0], r[0], t[0]) for c, r, t in outs]
        gt_b, gt_l, gt_v = _gts()
        loss = jax.jit(lambda f: P.paa_loss(f, gt_b, gt_l, gt_v, 4))(flat)
        for v in loss:
            assert np.isfinite(float(v)), loss
        det = jax.jit(lambda f: P.paa_decode(f, (128, 128), 4, nms_pre=50,
                                             max_per_img=10))(flat)
        assert det.boxes.shape == (10, 4)

    def test_gmm_separates_two_clusters(self):
        from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
            paa_head as P,
        )

        scores = jnp.asarray([[0.1, 0.12, 0.11, 3.0, 3.1, 2.9]])
        valid = jnp.ones((1, 6), bool)
        pos = np.asarray(P._gmm_pos_split(scores, valid)[0])
        # scheme (c): positives are the fg candidates up to the fg mode's
        # loss — a nonempty subset of the low cluster, never the high one.
        assert pos.any()
        assert not pos[3:].any()
        assert pos[0]  # the lowest-loss candidate is always kept


class TestZooRegistration:
    def test_new_families_registered(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa
        from lowlightenvironmentvideoobjectdetection_tpu.registry import (
            MODELS,
        )

        for name in ("FSAF", "FoveaBox", "FreeAnchor", "PAA"):
            assert MODELS.get(name) is not None
