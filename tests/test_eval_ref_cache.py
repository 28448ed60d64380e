"""Frame-0 ref preprocessing cache in the streaming eval loop (VERDICT r2
weak #8): the adaptive-stride sampler's frame-0 refs span the whole video,
so without caching every ref frame is pipeline-processed twice (once for the
memo at frame 0, once when it streams). ``single_device_test`` now reuses
the prepared dicts, bounding pipeline work at one run per distinct frame.

Pure host logic — tested with counting stubs, no jax.
"""

import numpy as np

from lowlightenvironmentvideoobjectdetection_tpu.apis.test import (
    single_device_test,
)


class _CountingPipe:
    def __init__(self):
        self.calls = []

    def __call__(self, d):
        name = d["img_info"]["filename"]
        self.calls.append(name)
        return dict(
            img=np.zeros((8, 8, 3), np.float32),
            img_shape=(8, 8),
            scale_factor=np.ones(4, np.float32),
        )


class _FakeVideoDS:
    """One 6-frame video; frame 0 carries refs at frames {0, 2, 4, 5}."""

    img_prefix = ""

    def __init__(self):
        self.infos = [
            dict(id=i, filename=f"f{i}.jpg", frame_id=i) for i in range(6)
        ]

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, i):
        s = dict(img_info=self.infos[i])
        if i == 0:
            s["ref_img_infos"] = [self.infos[j] for j in (0, 2, 4, 5)]
        s["ann"] = dict(
            bboxes=np.zeros((0, 4), np.float32),
            labels=np.zeros((0,), np.int64),
        )
        return s


class _FakeModel:
    def __init__(self):
        self.ref_counts = []

    def inference_vid_prepared(self, img, img_shape, scale_factor, frame_id,
                               ref_imgs=None):
        if frame_id == 0:
            self.ref_counts.append(
                None if ref_imgs is None else len(ref_imgs))
        return {"bbox_results": [np.zeros((0, 5), np.float32)]}


def test_refs_prepared_once_per_distinct_frame():
    ds, pipe, model = _FakeVideoDS(), _CountingPipe(), _FakeModel()
    dets, anns = single_device_test(model, ds, pipe)
    assert len(dets) == 6 and len(anns) == 6
    # the memo still got all 4 refs
    assert model.ref_counts == [4]
    # 6 frames + 4 refs naively = 10 pipeline runs; cached: one per
    # distinct frame = 6 (frame 0 reused for its own ref slot; refs 2/4/5
    # reused when they stream)
    assert len(pipe.calls) == 6, pipe.calls
    assert sorted(pipe.calls) == [f"f{i}.jpg" for i in range(6)]


def test_cache_resets_between_videos():
    class _TwoVideoDS(_FakeVideoDS):
        def __init__(self):
            self.infos = [
                dict(id=i, filename=f"v{v}_f{i}.jpg", frame_id=i)
                for v in (0, 1) for i in range(3)
            ]

        def __getitem__(self, i):
            s = dict(img_info=self.infos[i])
            if self.infos[i]["frame_id"] == 0:
                base = (i // 3) * 3
                s["ref_img_infos"] = [self.infos[base + j] for j in (1, 2)]
            s["ann"] = dict(
                bboxes=np.zeros((0, 4), np.float32),
                labels=np.zeros((0,), np.int64),
            )
            return s

    ds, pipe, model = _TwoVideoDS(), _CountingPipe(), _FakeModel()
    dets, _ = single_device_test(model, ds, pipe)
    assert len(dets) == 6
    assert model.ref_counts == [2, 2]
    # one run per distinct frame across both videos
    assert len(pipe.calls) == 6, pipe.calls
