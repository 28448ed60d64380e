"""Converter fidelity (VERDICT r4 #7): the repo converters must produce
BYTE-identical json to the reference's own converter code on a fixture
tree — is_vid_train_frame derived from the train-frame lists, val splits,
and the DarkFarm GT-pair + 600x400 variants.

The reference converters are executed directly from /root/reference with a
faked mmcv (list_from_file + json dump) and tqdm.
"""

import importlib.util
import json
import os
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CONV = "/root/reference/mmtracking/tools/convert_datasets"
REPO_CONV = os.path.join(REPO, "tools", "convert_datasets")


def _fake_mmcv():
    def list_from_file(p):
        return [l.rstrip("\n") for l in open(p)]

    def dump(obj, path):
        with open(path, "w") as f:
            json.dump(obj, f)

    if "mmcv" in sys.modules:  # ref_loader may have installed its own fake
        sys.modules["mmcv"].list_from_file = list_from_file
        sys.modules["mmcv"].dump = dump
    else:
        mmcv = types.ModuleType("mmcv")
        mmcv.list_from_file = list_from_file
        mmcv.dump = dump
        sys.modules["mmcv"] = mmcv
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda x: x
        sys.modules["tqdm"] = tq


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref(name):
    _fake_mmcv()
    return _load(os.path.join(REF_CONV, name + ".py"), "refconv_" + name)


def _repo(name):
    sys.path.insert(0, REPO_CONV)
    try:
        return _load(os.path.join(REPO_CONV, name + ".py"), "repoconv_" + name)
    finally:
        sys.path.pop(0)


def _xml(path, w, h, objects):
    """objects: [(name, x1, y1, x2, y2, trackid, occluded, generated)]"""
    rows = [f"<annotation><size><width>{w}</width>"
            f"<height>{h}</height></size>"]
    for (n, x1, y1, x2, y2, tid, occ, gen) in objects:
        rows.append(
            f"<object><name>{n}</name><trackid>{tid}</trackid>"
            f"<occluded>{occ}</occluded><generated>{gen}</generated>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
    rows.append("</annotation>")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("".join(rows))


class TestImagenetVidConverter:
    def _tree(self, root):
        """2 videos x 3 frames; video a has 2 instances (one leaves), one
        out-of-vocab object, one empty frame in video b."""
        lists = os.path.join(root, "Lists")
        os.makedirs(lists, exist_ok=True)
        # train list: video, 1, frame(1-BASED), num_frames
        with open(os.path.join(lists, "VID_train_15frames.txt"), "w") as f:
            f.write("train/vidA 1 1 3\ntrain/vidA 1 3 3\n"
                    "train/vidB 1 2 3\n")
        with open(os.path.join(lists, "VID_val_videos_8.txt"), "w") as f:
            f.write("val/vidA 1 0 3\n")
        ann = os.path.join(root, "Annotations", "VID")
        for vid, empties in (("train/vidA", ()), ("train/vidB", (1,)),
                             ("val/vidA", ())):
            for fid in range(3):
                objs = []
                if fid not in empties:
                    objs.append(("n02691156", 10, 12, 50 + fid, 60, 0, 0, 0))
                    if fid < 2:
                        objs.append(("n02419796", 5, 5, 30, 40, 1, 1, 0))
                    objs.append(("n99999999", 1, 1, 9, 9, 7, 0, 0))  # skip
                _xml(os.path.join(ann, vid, "%06d.xml" % fid), 640, 480,
                     objs)

    @pytest.mark.parametrize("mode", ["train", "val"])
    def test_byte_identical(self, tmp_path, mode):
        from collections import defaultdict

        root = str(tmp_path / "vidroot")
        self._tree(root)
        ref_out = str(tmp_path / "ref")
        repo_out = str(tmp_path / "repo")
        os.makedirs(ref_out)
        os.makedirs(repo_out)

        ref = _ref("imagenet2coco_vid")
        VID = defaultdict(list)
        VID["categories"] = [
            dict(id=k, name=v, encode_name=ref.CLASSES_ENCODES[k - 1])
            for k, v in enumerate(ref.CLASSES, 1)]
        try:
            ref.convert_vid(VID, root, ref_out, mode)
        except KeyError:
            # the reference's per-class summary print (ref :183) KeyErrors
            # when a class has zero objects — AFTER dumping the json
            pass

        repo = _repo("imagenet2coco_vid")
        repo.convert_vid(repo.base_json(), root, repo_out, mode)

        name = f"imagenet_vid_8_{mode}.json"
        a = open(os.path.join(ref_out, name), "rb").read()
        b = open(os.path.join(repo_out, name), "rb").read()
        assert a == b, "byte mismatch vs reference converter"
        # sanity on the semantics the old converter got wrong
        data = json.loads(b)
        flags = [i["is_vid_train_frame"] for i in data["images"]]
        if mode == "train":
            # vidA frames 0, 2 and vidB frame 1 only (1-based list entries)
            assert flags == [True, False, True, False, True, False]
        else:
            assert not any(flags)


class TestDarkfarmConverters:
    def _tree(self, root, gt_variant=False):
        lists = os.path.join(root, "Lists")
        os.makedirs(lists, exist_ok=True)
        vid = "day1/camA/scene1/noisy" if not gt_variant else \
            "day1/camA/scene1"
        for txt, row in (
            ("darkfarm_vid_train.txt", f"{vid} 0 2\n{vid} 1 2\n"),
            ("darkfarm_vid_test.txt", f"{vid} 0 2\n"),
            ("darkfarm_vid_gt_train.txt", f"{vid} 0 2\n"),
            ("darkfarm_vid_gt_val.txt", f"{vid} 0 2\n"),
            ("darkfarm_vid_e2e_train.txt", f"{vid} 0 2\n"),
            ("darkfarm_vid_e2e_val.txt", f"{vid} 0 2\n"),
        ):
            with open(os.path.join(lists, txt), "w") as f:
                f.write(row)
        for fid in range(2):
            objs = [("cow", 100, 200, 500, 700, 0, 0, 0),
                    ("person", 0, 0, 1920, 1080, 1, 0, 0)]
            if not gt_variant:
                _xml(os.path.join(root, "day1/camA/scene1/GT",
                                  f"{fid}.xml"), 1920, 1080, objs)
            else:
                _xml(os.path.join(root, vid, f"{fid}.xml"), 1920, 1080,
                     objs)
        return vid

    def _compare(self, tmp_path, ref_name, repo_name, prefix, mode,
                 gt_variant=False, ref_kwargs=None):
        from collections import defaultdict

        root = str(tmp_path / "dfroot")
        self._tree(root, gt_variant=gt_variant)
        ref_out = str(tmp_path / "ref")
        repo_out = str(tmp_path / "repo")
        os.makedirs(ref_out, exist_ok=True)
        os.makedirs(repo_out, exist_ok=True)

        ref = _ref(ref_name)
        VID = defaultdict(list)
        VID["categories"] = [dict(id=k, name=v)
                             for k, v in enumerate(ref.CLASSES, 1)]
        ref.convert_darkfarm(VID, root, ref_out, mode, prefix)

        repo = _repo("darkfarm2coco_vid")
        kw = dict(ref_kwargs or {})
        if kw.pop("use_gt_xml_path", False):
            kw["xml_path_fn"] = repo.xml_path_gt
        repo.convert_darkfarm(repo.base_json(), root, repo_out, mode,
                              prefix, **kw)
        a = open(os.path.join(ref_out, prefix + ".json"), "rb").read()
        b = open(os.path.join(repo_out, prefix + ".json"), "rb").read()
        assert a == b
        return json.loads(b)

    def test_noisy_train_byte_identical(self, tmp_path):
        data = self._compare(tmp_path, "darkfarm2coco_vid",
                             "darkfarm2coco_vid", "darkfarm_vid_x_train",
                             "train")
        assert all(i["is_vid_train_frame"] for i in data["images"])
        assert data["images"][0]["file_name"].endswith(".JPG")

    def test_noisy_val_byte_identical(self, tmp_path):
        data = self._compare(tmp_path, "darkfarm2coco_vid",
                             "darkfarm2coco_vid", "darkfarm_vid_test",
                             "val")
        assert not any(i["is_vid_train_frame"] for i in data["images"])

    def test_gt_variant_byte_identical(self, tmp_path):
        data = self._compare(
            tmp_path, "darkfarm2coco_vid_gt", "darkfarm2coco_vid",
            "darkfarm_vid_gt_val", "val", gt_variant=True,
            ref_kwargs=dict(use_gt_xml_path=True,
                            train_list="Lists/darkfarm_vid_gt_train.txt"))
        assert len(data["images"]) == 2

    def test_600x400_byte_identical(self, tmp_path):
        data = self._compare(
            tmp_path, "darkfarm2coco_600x400", "darkfarm2coco_vid",
            "darkfarm_vid_e2e_val", "val",
            ref_kwargs=dict(train_list="Lists/darkfarm_vid_e2e_train.txt",
                            file_ext="png", out_size=(600, 400)))
        img = data["images"][0]
        assert (img["width"], img["height"]) == (600, 400)
        assert img["file_name"].endswith(".png")
        # int-truncated, clamped rescale: 100*600/1920=31, 200*400/1080=74
        bb = data["annotations"][0]["bbox"]
        assert bb[:2] == [31, 74]
