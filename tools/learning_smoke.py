#!/usr/bin/env python
"""End-to-end learning smoke: train Faster R-CNN on a synthetic shapes
dataset and show mAP improves from ~0 to high.

This is the integration check the reference performs implicitly by training
real configs: the whole loop (data -> assigner/sampler -> RPN + RoI losses ->
optimizer -> streaming detect -> eval_map) must actually LEARN, not just run.
Synthetic task: bright axis-aligned rectangles of two classes (class 0:
wide, class 1: tall) on noisy backgrounds.

Usage: python tools/learning_smoke.py [--steps 300]
Prints one JSON line with mAP before/after.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_sample(rng, size=96, max_gts=4):
    img = rng.uniform(-0.4, 0.4, (size, size, 3)).astype(np.float32)
    n = rng.randint(1, max_gts)
    boxes = np.zeros((max_gts, 4), np.float32)
    labels = np.zeros((max_gts,), np.int32)
    valid = np.zeros((max_gts,), bool)
    for i in range(n):
        cls = rng.randint(0, 2)
        if cls == 0:  # wide
            w, h = rng.randint(28, 40), rng.randint(12, 18)
        else:  # tall
            w, h = rng.randint(12, 18), rng.randint(28, 40)
        x1 = rng.randint(0, size - w)
        y1 = rng.randint(0, size - h)
        color = rng.uniform(1.5, 2.5, (3,)).astype(np.float32)
        img[y1:y1 + h, x1:x1 + w] += color
        boxes[i] = [x1, y1, x1 + w, y1 + h]
        labels[i] = cls
        valid[i] = True
    return img, boxes, labels, valid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--eval-images", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-3)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from lowlightenvironmentvideoobjectdetection_tpu.core.eval.mean_ap import (
        eval_map,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.faster_rcnn import (
        DetTrainBatch, faster_rcnn_detect, faster_rcnn_loss, make_faster_rcnn,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
        SelsaConfig,
    )

    cfg = SelsaConfig(
        pad_h=96, pad_w=96, num_classes=2, compute_dtype=jnp.float32,
        train_nms_pre=256, train_nms_post=64, test_nms_pre=256,
        test_nms_post=64, num_roi_samples=64,
        # anchors sized to the synthetic 12-40px boxes (default scales give
        # 64-512px anchors at stride 16 -> zero positive assignments)
        anchor_scales=(1, 2, 3),
        frozen_stages=-1,  # from-scratch training
    )
    model, anchors = make_faster_rcnn(cfg)
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 96, 96, 3)))

    opt = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.adam(args.lr))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda q: faster_rcnn_loss(model, q, batch, key, anchors),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    detect = jax.jit(lambda p, im: faster_rcnn_detect(
        model, p, im, jnp.asarray([96.0, 96.0]), anchors))

    def evaluate(params):
        dets, annos = [], []
        erng = np.random.RandomState(12345)
        for _ in range(args.eval_images):
            img, boxes, labels, valid = make_sample(erng)
            d = detect(params, jnp.asarray(img))
            keep = np.asarray(d.valid) & (np.asarray(d.scores) > 0.01)
            per_class = []
            for c in range(2):
                m = keep & (np.asarray(d.labels) == c)
                per_class.append(np.concatenate(
                    [np.asarray(d.boxes)[m], np.asarray(d.scores)[m, None]],
                    axis=1))
            dets.append(per_class)
            annos.append(dict(bboxes=boxes[valid], labels=labels[valid]))
        return eval_map(dets, annos, iou_thr=0.5)[0]

    map_before = float(evaluate(params))
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        img, boxes, labels, valid = make_sample(rng)
        batch = DetTrainBatch(jnp.asarray(img), jnp.asarray([96.0, 96.0]),
                              jnp.asarray(boxes), jnp.asarray(labels),
                              jnp.asarray(valid))
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, batch, sub)
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss={float(loss):.4f}", file=sys.stderr)
    map_after = float(evaluate(params))
    print(json.dumps(dict(metric="learning_smoke_mAP50",
                          map_before=round(map_before, 4),
                          map_after=round(map_after, 4),
                          steps=args.steps)))


if __name__ == "__main__":
    main()
