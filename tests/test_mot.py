"""Tests for the MOT stack: Kalman, trackers, CLEAR-MOT eval, CMC."""

import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mot import eval_mot
from lowlightenvironmentvideoobjectdetection_tpu.core.motion.kalman import KalmanFilter
from lowlightenvironmentvideoobjectdetection_tpu.core.motion.linear import (
    CameraMotionCompensation,
    LinearMotion,
)
from lowlightenvironmentvideoobjectdetection_tpu.models.mot.trackers import (
    SortTracker,
    TracktorTracker,
    xyah2xyxy,
    xyxy2xyah,
)


class TestKalman:
    def test_initiate_predict_update_cycle(self):
        kf = KalmanFilter()
        m = np.array([100.0, 50.0, 0.5, 80.0])
        mean, cov = kf.initiate(m)
        assert mean.shape == (8,) and cov.shape == (8, 8)
        mean2, cov2 = kf.predict(mean, cov)
        np.testing.assert_allclose(mean2[:4], mean[:4])  # zero velocity
        # uncertainty grows on predict
        assert np.trace(cov2) > np.trace(cov)
        mean3, cov3 = kf.update(mean2, cov2, np.array([104.0, 52.0, 0.5, 80.0]))
        # state moves toward the measurement
        assert 100.0 < mean3[0] <= 104.0
        assert np.trace(cov3) < np.trace(cov2)

    def test_constant_velocity_tracking(self):
        kf = KalmanFilter()
        mean, cov = kf.initiate(np.array([0.0, 0.0, 0.5, 40.0]))
        for t in range(1, 10):
            mean, cov = kf.predict(mean, cov)
            mean, cov = kf.update(mean, cov, np.array([5.0 * t, 0.0, 0.5, 40.0]))
        mean, cov = kf.predict(mean, cov)
        # learned velocity ~5 px/frame
        assert abs(mean[0] - 50.0) < 2.0

    def test_gating_distance(self):
        kf = KalmanFilter()
        mean, cov = kf.initiate(np.array([100.0, 100.0, 0.5, 40.0]))
        d = kf.gating_distance(
            mean, cov,
            np.array([[100.0, 100.0, 0.5, 40.0], [400.0, 400.0, 0.5, 40.0]]),
        )
        assert d[0] < kf.gating_threshold < d[1]

    def test_xyah_roundtrip(self):
        b = np.array([[10.0, 20.0, 50.0, 100.0]])
        np.testing.assert_allclose(xyah2xyxy(xyxy2xyah(b)), b, atol=1e-5)


class TestSortTracker:
    def _frame_boxes(self, t):
        # two objects moving right at different speeds
        return np.array(
            [[10 + 5 * t, 10, 50 + 5 * t, 90], [200 + 2 * t, 50, 260 + 2 * t, 170]],
            np.float32,
        )

    def test_identity_persistence(self):
        tracker = SortTracker(num_tentatives=1)
        ids_seq = []
        for t in range(5):
            boxes = self._frame_boxes(t)
            ids, keep = tracker.track(
                t, boxes, np.array([0.9, 0.8]), np.array([0, 0])
            )
            ids_seq.append(list(ids))
        # same ids across all frames
        for ids in ids_seq[1:]:
            assert ids == ids_seq[0]

    def test_new_track_spawn(self):
        tracker = SortTracker(num_tentatives=1)
        tracker.track(0, self._frame_boxes(0), np.array([0.9, 0.8]), np.array([0, 0]))
        boxes = np.vstack([self._frame_boxes(1), [[400, 400, 440, 480]]]).astype(
            np.float32
        )
        ids, _ = tracker.track(1, boxes, np.array([0.9, 0.8, 0.7]), np.zeros(3, int))
        assert ids[2] not in (ids[0], ids[1])

    def test_low_score_filtered(self):
        tracker = SortTracker()
        ids, keep = tracker.track(
            0, np.array([[0, 0, 10, 10]], np.float32), np.array([0.1]), np.array([0])
        )
        assert not keep[0] and ids[0] == -1

    def test_reid_matching(self):
        tracker = SortTracker(num_tentatives=1)
        e0 = np.eye(2, 8)[0] * 10
        e1 = np.eye(2, 8)[1] * 10
        tracker.track(0, self._frame_boxes(0), np.array([0.9, 0.8]),
                      np.array([0, 0]), embeds=np.stack([e0, e1]))
        # second frame: same embeddings, slightly moved boxes
        ids, _ = tracker.track(1, self._frame_boxes(1), np.array([0.9, 0.8]),
                               np.array([0, 0]), embeds=np.stack([e0, e1]))
        assert ids[0] != ids[1] and set(ids) == {0, 1}


class TestTracktor:
    def test_regression_keeps_tracks(self):
        tracker = TracktorTracker()
        b0 = np.array([[10, 10, 50, 90]], np.float32)
        tracker.track(0, b0, np.array([0.9]), np.array([0]))
        assert len(tracker.ids) == 1
        # frame 1: regression moved the box, still confident
        ids, tb, ts, tl = tracker.track(
            1, np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, int),
            regressed_bboxes=np.array([[12, 10, 52, 90]], np.float32),
            regressed_scores=np.array([0.8]),
        )
        assert len(ids) == 1
        np.testing.assert_allclose(tb[0], [12, 10, 52, 90])


class TestEvalMot:
    def test_perfect_tracking(self):
        frames = [
            dict(bboxes=np.array([[0, 0, 10, 10], [50, 50, 70, 90]]),
                 ids=np.array([1, 2]))
            for _ in range(5)
        ]
        res = eval_mot([frames], [frames])
        assert res["MOTA"] == pytest.approx(1.0)
        assert res["IDF1"] == pytest.approx(1.0)
        assert res["IDSw"] == 0 and res["MT"] == 2

    def test_id_switch_detected(self):
        gt = [
            dict(bboxes=np.array([[0, 0, 10, 10]]), ids=np.array([1]))
            for _ in range(4)
        ]
        pred = [
            dict(bboxes=np.array([[0, 0, 10, 10]]), ids=np.array([7])),
            dict(bboxes=np.array([[0, 0, 10, 10]]), ids=np.array([7])),
            dict(bboxes=np.array([[0, 0, 10, 10]]), ids=np.array([8])),
            dict(bboxes=np.array([[0, 0, 10, 10]]), ids=np.array([8])),
        ]
        res = eval_mot([gt], [pred])
        assert res["IDSw"] == 1
        assert res["MOTA"] == pytest.approx(1.0 - 1.0 / 4)

    def test_fp_fn(self):
        gt = [dict(bboxes=np.array([[0, 0, 10, 10]]), ids=np.array([1]))]
        pred = [dict(bboxes=np.array([[100, 100, 110, 110]]), ids=np.array([5]))]
        res = eval_mot([gt], [pred])
        assert res["FP"] == 1 and res["FN"] == 1


class TestMotionUtils:
    def test_linear_motion(self):
        lm = LinearMotion(num_samples=3)
        hist = [np.array([0, 0, 10, 10]), np.array([5, 0, 15, 10]),
                np.array([10, 0, 20, 10])]
        nxt = lm.step(hist)
        np.testing.assert_allclose(nxt, [15, 0, 25, 10])

    def test_cmc_translation(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(0, 255, (128, 128)).astype(np.float32)
        shifted = np.roll(img, (8, 12), axis=(0, 1))  # content moves +8y, +12x
        cmc = CameraMotionCompensation(downscale=1)
        boxes = np.array([[20, 20, 40, 40]], np.float32)
        out = cmc.track(img, shifted, boxes)
        np.testing.assert_allclose(out[0], [32, 28, 52, 48], atol=1.0)


class TestTrackUtils:
    def test_track2result_roundtrip(self):
        import numpy as np
        from lowlightenvironmentvideoobjectdetection_tpu.core.track_utils import (
            restore_result, track2result,
        )

        bboxes = np.asarray([[0, 0, 10, 10, 0.9], [5, 5, 20, 20, 0.8]], np.float32)
        labels = np.asarray([0, 2])
        ids = np.asarray([7, 9])
        res = track2result(bboxes, labels, ids, num_classes=3)
        assert len(res) == 3 and res[1].shape == (0, 6)
        b2, l2, i2 = restore_result(res)
        assert sorted(i2.tolist()) == [7, 9]
        assert sorted(l2.tolist()) == [0, 2]
        assert b2.shape == (2, 5)

    def test_imrenormalize(self):
        import numpy as np
        from lowlightenvironmentvideoobjectdetection_tpu.core.track_utils import (
            imrenormalize,
        )

        raw = np.random.RandomState(0).uniform(0, 255, (8, 8, 3)).astype(np.float32)
        c1 = dict(mean=[100, 100, 100], std=[50, 50, 50], to_rgb=False)
        c2 = dict(mean=[0, 0, 0], std=[255, 255, 255], to_rgb=False)
        img1 = (raw - 100) / 50
        img2 = imrenormalize(img1, c1, c2)
        np.testing.assert_allclose(img2, raw / 255, rtol=1e-5)

    def test_embed_similarity(self):
        import numpy as np
        from lowlightenvironmentvideoobjectdetection_tpu.core.track_utils import (
            embed_similarity,
        )

        k = np.asarray([[1.0, 0.0], [0.0, 2.0]])
        r = np.asarray([[2.0, 0.0], [0.0, 1.0]])
        cos = embed_similarity(k, r, method="cosine")
        np.testing.assert_allclose(cos, np.eye(2), atol=1e-6)
        dot = embed_similarity(k, r)
        np.testing.assert_allclose(dot, [[2, 0], [0, 2]])


class TestKalmanBatched:
    """The batched-across-tracks Kalman variants (kalman.py predict_batch/
    gating_distance_batch/update_batch — the tracking-loop host hotspot)
    must match the single-track methods they replace."""

    def _random_tracks(self, rng, t):
        means, covs = [], []
        kf = KalmanFilter()
        for _ in range(t):
            m, c = kf.initiate(rng.uniform(1, 200, 4))
            for _ in range(rng.randint(0, 4)):  # de-correlate covariances
                m, c = kf.predict(m, c)
                m, c = kf.update(m, c, rng.uniform(1, 200, 4))
            means.append(m)
            covs.append(c)
        return np.stack(means), np.stack(covs)

    def test_predict_and_gating_match_sequential(self):
        rng = np.random.RandomState(0)
        kf = KalmanFilter()
        means, covs = self._random_tracks(rng, 7)
        meas = rng.uniform(1, 200, (5, 4))
        bm, bc = kf.predict_batch(means, covs)
        bg = kf.gating_distance_batch(bm, bc, meas)
        for k in range(len(means)):
            sm, sc = kf.predict(means[k], covs[k])
            np.testing.assert_allclose(bm[k], sm, rtol=1e-12)
            np.testing.assert_allclose(bc[k], sc, rtol=1e-12)
            np.testing.assert_allclose(
                bg[k], kf.gating_distance(sm, sc, meas), rtol=1e-9)

    def test_update_matches_sequential(self):
        rng = np.random.RandomState(1)
        kf = KalmanFilter()
        means, covs = self._random_tracks(rng, 6)
        meas = rng.uniform(1, 200, (6, 4))
        bm, bc = kf.update_batch(means, covs, meas)
        for k in range(len(means)):
            sm, sc = kf.update(means[k], covs[k], meas[k])
            np.testing.assert_allclose(bm[k], sm, rtol=1e-8, atol=1e-8)
            np.testing.assert_allclose(bc[k], sc, rtol=1e-8, atol=1e-8)

    def test_center_only_gating(self):
        rng = np.random.RandomState(2)
        kf = KalmanFilter(center_only=True)
        means, covs = self._random_tracks(rng, 4)
        meas = rng.uniform(1, 200, (3, 4))
        bg = kf.gating_distance_batch(means, covs, meas, only_position=True)
        for k in range(len(means)):
            np.testing.assert_allclose(
                bg[k],
                kf.gating_distance(means[k], covs[k], meas,
                                   only_position=True),
                rtol=1e-9)
