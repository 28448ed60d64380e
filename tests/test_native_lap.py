"""Tests for the native C++ Jonker-Volgenant LAP solver (ops/lap.py)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from lowlightenvironmentvideoobjectdetection_tpu.ops import lap


class TestNativeLAP:
    def test_native_loads(self):
        assert lap.is_native(), "C++ solver should build with the baked g++"

    @pytest.mark.parametrize("shape", [(3, 3), (5, 8), (8, 5), (1, 1), (10, 10)])
    def test_matches_scipy_optimal_cost(self, shape):
        rng = np.random.RandomState(sum(shape))
        for trial in range(10):
            cost = rng.uniform(0, 10, shape)
            r, c = lap.linear_sum_assignment(cost)
            rs, cs = scipy_lsa(cost)
            assert cost[r, c].sum() == pytest.approx(cost[rs, cs].sum())
            # valid assignment: unique rows/cols
            assert len(set(r.tolist())) == len(r)
            assert len(set(c.tolist())) == len(c)

    def test_empty(self):
        r, c = lap.linear_sum_assignment(np.zeros((0, 5)))
        assert len(r) == 0 and len(c) == 0

    def test_infinite_costs_skipped(self):
        cost = np.array([[np.inf, 1.0], [2.0, np.inf]])
        r, c = lap.linear_sum_assignment(cost)
        total = cost[r, c].sum()
        assert np.isfinite(total)
        assert total == pytest.approx(3.0)

    def test_greedy(self):
        cost = np.array([[0.1, 0.9], [0.9, 0.2], [0.5, 0.5]])
        r, c = lap.greedy_assignment(cost, thr=0.4)
        got = dict(zip(r.tolist(), c.tolist()))
        assert got == {0: 0, 1: 1}  # 0.5 pairs exceed thr

    def test_tracker_still_works_with_native_solver(self):
        """SORT matching path uses the native solver end-to-end."""
        from lowlightenvironmentvideoobjectdetection_tpu.models.mot import (
            trackers,
        )

        assert "ops.lap" in trackers.linear_sum_assignment.__module__.replace(
            "lowlightenvironmentvideoobjectdetection_tpu.", "ops.lap"
        ) or trackers.linear_sum_assignment is lap.linear_sum_assignment


class TestAuxUtils:
    def test_cmc_identity_on_same_frame(self):
        from lowlightenvironmentvideoobjectdetection_tpu.core.motion.cmc import (
            CameraMotionCompensation,
        )

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        cmc = CameraMotionCompensation()
        boxes = np.array([[10.0, 10.0, 30.0, 30.0]])
        out = cmc.track(img, img, boxes)
        np.testing.assert_allclose(out, boxes, atol=0.5)

    def test_cmc_translation_recovered(self):
        from lowlightenvironmentvideoobjectdetection_tpu.core.motion.cmc import (
            CameraMotionCompensation,
        )

        rng = np.random.RandomState(1)
        base = rng.randint(0, 255, (80, 80, 3), dtype=np.uint8)
        shifted = np.roll(base, shift=(0, 5), axis=(0, 1))  # shift +5 in x
        cmc = CameraMotionCompensation(warp_mode="translation")
        boxes = np.array([[20.0, 20.0, 40.0, 40.0]])
        out = cmc.track(shifted, base, boxes)
        assert abs(float(out[0, 0]) - 25.0) < 1.5  # x moved by ~+5

    def test_psnr_ssim(self):
        from lowlightenvironmentvideoobjectdetection_tpu.core.eval.image_metrics import (
            psnr, ssim,
        )

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (32, 32, 3)).astype(np.float64)
        assert psnr(img, img) == float("inf")
        assert ssim(img, img) == pytest.approx(1.0)
        noisy = img + rng.randn(32, 32, 3) * 25
        p = psnr(img, noisy)
        assert 15 < p < 25  # sigma 25 -> ~20 dB
        assert ssim(img, noisy) < 0.95

    def test_visualization_draws(self, tmp_path):
        from lowlightenvironmentvideoobjectdetection_tpu.utils.visualization import (
            imshow_dets, imshow_tracks, plot_noise_clean_pairs,
        )

        img = np.zeros((64, 64, 3), np.uint8)
        out = imshow_dets(img, np.array([[5, 5, 30, 30.0]]),
                          np.array([1]), np.array([0.9]),
                          out_file=str(tmp_path / "det.jpg"))
        assert out.sum() > 0  # something was drawn
        out2 = imshow_tracks(img, np.array([[3, 5, 5, 30, 30, 0.9]]))
        assert out2.sum() > 0
        pair = np.random.RandomState(0).uniform(0, 1, (16, 16, 6))
        canvas = plot_noise_clean_pairs(pair)
        assert canvas.shape == (16, 32, 3)
