"""Image-detector training through the train CLI machinery (the reference's
USE_MMDET switch, tools/train.py:69-76): FasterRCNN on a tiny on-disk
CocoDataset fixture."""

import importlib.util
import json
import os

import jax
import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_train_module():
    spec = importlib.util.spec_from_file_location(
        "tools_train_img", os.path.join(REPO, "tools", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco_det")
    (root / "imgs").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        img = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "imgs" / f"{i:06d}.jpg"), img)
        images.append(dict(id=i + 1, file_name=f"imgs/{i:06d}.jpg",
                           width=64, height=48))
        annotations.append(dict(
            id=i + 1, image_id=i + 1, category_id=1,
            bbox=[8, 8, 24, 20], area=480, iscrowd=0))
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name="person"),
                           dict(id=2, name="car")])
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return dict(root=str(root), ann_file=str(ann_file))


def test_faster_rcnn_trains_on_coco_images(coco_fixture):
    mod = _load_train_module()
    cfg = {
        "model": dict(type="FasterRCNN", num_classes=2),
        "data": {"train": dict(
            type="CocoDataset",
            ann_file=coco_fixture["ann_file"],
            img_prefix=coco_fixture["root"] + "/",
            pipeline=[
                dict(type="LoadImageFromFile"),
                dict(type="LoadAnnotations", with_bbox=True),
                dict(type="Resize", img_scale=(64, 48)),
                dict(type="Normalize"),
                dict(type="Pad", size_divisor=16),
            ],
        )},
    }
    model, anchors, loss_fn, synth, make_batch = mod.build_system(cfg, tiny=True)
    it = mod.dataset_iterator(cfg, model, max_gts=8)
    d = next(it)
    batch = make_batch(d)
    assert batch.img.ndim == 3 and batch.img.shape[-1] == 3
    assert bool(batch.gt_valid[0])

    import jax.numpy as jnp

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    def lf(v):
        loss, metrics = loss_fn(v, batch, jax.random.PRNGKey(1))
        return loss

    loss, grads = jax.value_and_grad(lf)(variables)
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gsum > 0
