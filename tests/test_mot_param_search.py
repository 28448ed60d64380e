"""tools/mot_param_search.py rebuilds the TRACKER per grid point over saved
detections (VERDICT r4 #8) — tracker hyperparameters (obj_score_thr,
num_tentatives, match_iou_thr), not just post-hoc score thresholds, must
change the association and hence MOTA on the fixture."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _search_mod():
    spec = importlib.util.spec_from_file_location(
        "mot_param_search", os.path.join(REPO, "tools", "mot_param_search.py"))
    mod = importlib.util.module_from_spec(spec)
    # tools scripts parse args at import only under __main__; this one
    # defines functions at module level
    spec.loader.exec_module(mod)
    return mod


def _mot_json(tmp_path, n_frames=6):
    images, anns = [], []
    img_id = ann_id = 0
    for fid in range(n_frames):
        img_id += 1
        images.append(dict(id=img_id, video_id=1, frame_id=fid,
                           file_name=f"img1/{fid + 1:06d}.jpg",
                           width=640, height=480))
        for tid in (1, 2):
            ann_id += 1
            x = 50 + 10 * fid + 150 * tid
            anns.append(dict(id=ann_id, image_id=img_id, category_id=1,
                             bbox=[x, 100, 40, 80], area=3200, iscrowd=0,
                             instance_id=tid, visibility=1.0))
    data = dict(videos=[dict(id=1, name="MOT17-02")], images=images,
                annotations=anns,
                categories=[dict(id=1, name="pedestrian")])
    path = tmp_path / "mot.json"
    path.write_text(json.dumps(data))
    return str(path)


def _dets(n_frames=6, noise_score=0.45):
    """Saved detector output: the two gt tracks (score .9) plus one spurious
    low-score detection per frame."""
    frames = []
    rng = np.random.RandomState(0)
    for fid in range(n_frames):
        boxes, scores = [], []
        for tid in (1, 2):
            x = 50 + 10 * fid + 150 * tid
            boxes.append([x, 100, x + 40, 180])
            scores.append(0.9)
        boxes.append([420 + rng.uniform(-80, 80), 300, 480, 380])
        scores.append(noise_score)
        frames.append(dict(det_bboxes=boxes, det_scores=scores,
                           det_labels=[0] * len(boxes)))
    return frames


class TestParseSearch:
    def test_types(self):
        m = _search_mod()
        got = m.parse_search(["obj_score_thr=0.3,0.5", "num_tentatives=1,3"])
        assert got == {"obj_score_thr": [0.3, 0.5], "num_tentatives": [1, 3]}
        assert isinstance(got["num_tentatives"][0], int)


class TestTrackerRebuild:
    def test_obj_score_thr_changes_mota(self, tmp_path):
        """Low threshold admits the spurious detections (FPs -> lower MOTA);
        a threshold above the noise score filters them."""
        from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
            MOTChallengeDataset,
        )

        m = _search_mod()
        ds = MOTChallengeDataset(ann_file=_mot_json(tmp_path), test_mode=True)
        frames = _dets()
        res_lo = m.run_tracker(ds, frames, dict(obj_score_thr=0.3))
        res_hi = m.run_tracker(ds, frames, dict(obj_score_thr=0.5))
        mota_lo = ds.evaluate(res_lo)["MOTA"]
        mota_hi = ds.evaluate(res_hi)["MOTA"]
        assert mota_hi > mota_lo, (mota_lo, mota_hi)
        assert mota_hi == pytest.approx(1.0)

    def test_match_iou_thr_changes_associations(self, tmp_path):
        """match_iou_thr is a pure TRACKER parameter: detections jittered to
        ~0.45 IoU vs the track prediction keep their ids under a permissive
        threshold but spawn fresh ids under a strict one — more id churn,
        different MOTA/IDSW. No post-hoc score filter can emulate this."""
        from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
            MOTChallengeDataset,
        )

        m = _search_mod()
        ds = MOTChallengeDataset(ann_file=_mot_json(tmp_path), test_mode=True)
        frames = _dets()
        # shift every detection right by half a box width on odd frames
        for fid, fr in enumerate(frames):
            if fid % 2:
                fr["det_bboxes"] = [[x1 + 22, y1, x2 + 22, y2]
                                    for x1, y1, x2, y2 in fr["det_bboxes"]]
        res_loose = m.run_tracker(ds, frames, dict(obj_score_thr=0.5,
                                                   match_iou_thr=0.9))
        res_strict = m.run_tracker(ds, frames, dict(obj_score_thr=0.5,
                                                    match_iou_thr=0.1))
        ids_loose = {int(r) for fr in res_loose
                     for r in np.asarray(fr["track_bboxes"])[:, 0]}
        ids_strict = {int(r) for fr in res_strict
                      for r in np.asarray(fr["track_bboxes"])[:, 0]}
        # the strict threshold fragments tracks into more identities
        assert len(ids_strict) > len(ids_loose), (ids_loose, ids_strict)

    def test_num_frames_retain_changes_identities(self, tmp_path):
        """num_frames_retain keeps lost tracks alive through occlusion — a
        stationary object that vanishes for 2 frames keeps its id with a
        long retention window but gets a fresh id when tracks are dropped
        immediately. Pure tracker state-machine behavior."""
        from lowlightenvironmentvideoobjectdetection_tpu.data.mot_sot_datasets import (
            MOTChallengeDataset,
        )

        m = _search_mod()
        ds = MOTChallengeDataset(ann_file=_mot_json(tmp_path), test_mode=True)
        # stationary detections; object 2 missing on frames 2-3
        frames = []
        for fid in range(6):
            boxes = [[200, 100, 240, 180]]
            scores = [0.9]
            if fid not in (2, 3):
                boxes.append([400, 100, 440, 180])
                scores.append(0.9)
            frames.append(dict(det_bboxes=boxes, det_scores=scores,
                               det_labels=[0] * len(boxes)))
        res_keep = m.run_tracker(ds, frames, dict(obj_score_thr=0.5,
                                                  num_frames_retain=30))
        res_drop = m.run_tracker(ds, frames, dict(obj_score_thr=0.5,
                                                  num_frames_retain=1))
        def n_ids(res):
            return len({int(r) for fr in res
                        for r in np.asarray(fr["track_bboxes"])[:, 0]})
        assert n_ids(res_keep) < n_ids(res_drop), (n_ids(res_keep),
                                                   n_ids(res_drop))
