"""Round-2 API/data additions: inference_sot, Tracktor CMC/linear-motion
wiring, CocoDataset, MultiScaleFlipAug TTA, OHEM sampler, nms_match."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]


class TestInferenceSOT:
    def test_streaming_track(self):
        from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
            inference_sot, init_sot_model,
        )

        m = init_sot_model(exemplar_size=63, search_size=127)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (160, 160, 3)).astype(np.float32)
        r0 = inference_sot(m, img, [40.0, 40.0, 90.0, 90.0], frame_id=0)
        assert r0["track_bboxes"].shape == (5,)
        r1 = inference_sot(m, img, None, frame_id=1)
        assert r1["track_bboxes"].shape == (5,)
        assert np.all(np.isfinite(r1["track_bboxes"]))


class TestTracktorMotion:
    def test_cmc_and_linear_motion_wired(self):
        from lowlightenvironmentvideoobjectdetection_tpu import zoo  # noqa
        from lowlightenvironmentvideoobjectdetection_tpu.registry import (
            MODELS,
        )

        model = MODELS.get("Tracktor")(
            num_classes=2, pad_h=64, pad_w=64, test_nms_pre=64,
            test_nms_post=8, compute_dtype=jnp.float32,
            with_cmc=True, with_linear_motion=True)
        assert model.with_cmc and model.with_linear_motion
        rng = np.random.RandomState(0)
        for fid in range(3):
            raw = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
            img = jnp.asarray(raw, jnp.float32)
            out = model.track_frame(fid, img, (64.0, 64.0), raw_img=raw)
        assert "track_bboxes" in out


class TestCocoDataset:
    @pytest.fixture()
    def coco_fixture(self, tmp_path):
        import cv2

        (tmp_path / "imgs").mkdir()
        images, annotations = [], []
        rng = np.random.RandomState(0)
        for i in range(3):
            cv2.imwrite(str(tmp_path / "imgs" / f"{i}.jpg"),
                        rng.randint(0, 255, (32, 48, 3)).astype(np.uint8))
            images.append(dict(id=i + 1, file_name=f"imgs/{i}.jpg",
                               width=48, height=32))
            if i < 2:  # image 3 has no annotations
                annotations.append(dict(
                    id=i + 1, image_id=i + 1, category_id=1,
                    bbox=[4, 4, 20, 16], area=320, iscrowd=0))
        ann = dict(images=images, annotations=annotations,
                   categories=[dict(id=1, name="person"),
                               dict(id=2, name="car")])
        f = tmp_path / "coco.json"
        f.write_text(json.dumps(ann))
        return dict(ann_file=str(f), root=str(tmp_path))

    def test_filtering_and_ann(self, coco_fixture):
        from lowlightenvironmentvideoobjectdetection_tpu.data.coco_det import (
            CocoDataset,
        )

        ds = CocoDataset(ann_file=coco_fixture["ann_file"],
                         img_prefix=coco_fixture["root"],
                         classes=("person", "car"))
        assert len(ds) == 2  # empty-gt image filtered in train mode
        s = ds[0]
        assert s["ann"]["bboxes"].shape == (1, 4)
        np.testing.assert_allclose(s["ann"]["bboxes"][0], [4, 4, 24, 20])

        ds_test = CocoDataset(ann_file=coco_fixture["ann_file"],
                              img_prefix=coco_fixture["root"],
                              classes=("person", "car"), test_mode=True)
        assert len(ds_test) == 3

    def test_tta_scales_and_flip(self, coco_fixture):
        from lowlightenvironmentvideoobjectdetection_tpu.data.coco_det import (
            CocoDataset, MultiScaleFlipAug,
        )

        ds = CocoDataset(ann_file=coco_fixture["ann_file"],
                         img_prefix=coco_fixture["root"],
                         classes=("person", "car"), test_mode=True)
        tta = MultiScaleFlipAug(
            transforms=[dict(type="LoadImageFromFile"),
                        dict(type="Resize", img_scale=(48, 32)),
                        dict(type="Normalize")],
            img_scale=[(48, 32), (96, 64)], flip=True)
        s = ds[0]
        outs = tta(dict(img_info=s["img_info"], ann=s["ann"],
                        img_prefix=ds.img_prefix))
        assert len(outs) == 4  # 2 scales x 2 flips
        assert outs[0]["flip"] is False and outs[1]["flip"] is True
        # flipped image is the mirror of the unflipped one
        np.testing.assert_allclose(outs[1]["img"],
                                   outs[0]["img"][:, ::-1], rtol=1e-5)

    def test_merge_aug_detections(self):
        from lowlightenvironmentvideoobjectdetection_tpu.data.coco_det import (
            merge_aug_detections, unflip_boxes,
        )

        a1 = [np.asarray([[10, 10, 20, 20, 0.9]], np.float32),
              np.zeros((0, 5), np.float32)]
        a2 = [np.asarray([[10.5, 10, 20.5, 20, 0.8]], np.float32),
              np.zeros((0, 5), np.float32)]
        merged = merge_aug_detections([a1, a2], [], num_classes=2)
        # near-duplicates collapse to one detection
        assert len(merged[0]) == 1 and len(merged[1]) == 0
        assert merged[0][0, 4] == pytest.approx(0.9)

        flipped = unflip_boxes(np.asarray([[10.0, 5.0, 20.0, 15.0]]), 100.0)
        np.testing.assert_allclose(flipped, [[80.0, 5.0, 90.0, 15.0]])


class TestOHEMAndNMSMatch:
    def test_ohem_prefers_hard_negatives(self):
        from lowlightenvironmentvideoobjectdetection_tpu.core.assigners import (
            AssignResult, ohem_sample_gather,
        )

        n = 10
        assigned = jnp.asarray([1, 1, 0, 0, 0, 0, 0, 0, 0, 0], jnp.int32)
        losses = jnp.asarray([0.1, 0.2, 0.9, 0.05, 0.8, 0.01, 0.02, 0.03,
                              0.04, 0.06])
        assign = AssignResult(assigned, jnp.zeros(n), jnp.zeros(n, jnp.int32))
        res = ohem_sample_gather(assign, losses, num=4, pos_fraction=0.5)
        sel = set(np.asarray(res.inds)[np.asarray(res.is_valid)].tolist())
        # both positives + the two hardest negatives (2 and 4)
        assert {0, 1, 2, 4} == sel

    def test_nms_match_groups(self):
        from lowlightenvironmentvideoobjectdetection_tpu.core.nms import (
            nms_match,
        )

        boxes = jnp.asarray([
            [0, 0, 10, 10],     # A (score .9) root
            [1, 1, 10.5, 10.5],  # overlaps A
            [50, 50, 60, 60],   # B (score .8) root
            [0.5, 0, 10, 10.2],  # overlaps A
        ], jnp.float32)
        scores = jnp.asarray([0.9, 0.5, 0.8, 0.4])
        root = np.asarray(nms_match(boxes, scores, 0.5))
        assert root[0] == 0 and root[2] == 2
        assert root[1] == 0 and root[3] == 0
