#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Honest per-component timing of the SELSA streaming step on the real TPU.

Each component is timed with bench.py's methodology: a serial data
dependency chains N calls (no dispatch pipelining), and the difference
between a long and a short chain cancels the end-of-chain readback."""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig, SelsaDetector, init_params, make_anchors)
from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import rpn_head as rpn

cfg = SelsaConfig()
model = SelsaDetector(cfg=cfg)
params = init_params(model, jax.random.PRNGKey(0), small=True)
anchors = make_anchors(cfg)
img_shape = jnp.asarray([600.0, 1000.0])


def chain_time(step, state0, n_short=20, n_long=120):
    """step: (params, carry) -> carry with data dependency; returns ms."""
    st = step(params, state0)
    jax.block_until_ready(st)

    def run(n):
        t0 = time.perf_counter()
        s = state0
        for _ in range(n):
            s = step(params, s)
        jax.device_get(jax.tree_util.tree_leaves(s)[0].ravel()[0])
        return time.perf_counter() - t0

    diffs = []
    for _ in range(3):
        diffs.append(run(n_long) - run(n_short))
    diffs.sort()
    return diffs[1] / (n_long - n_short) * 1000


results = {}

# 1. backbone+neck
frame = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pad_h, cfg.pad_w, 3))


@jax.jit
def step_extract(p, fr):
    _, neck = model.apply(p, fr, method=SelsaDetector.extract_feat)
    return fr + 1e-12 * neck.astype(jnp.float32).sum()


results["extract_ms"] = chain_time(step_extract, frame)

# 2. rpn conv + proposal decode + NMS
_, neck0 = jax.jit(lambda p, fr: model.apply(p, fr, method=SelsaDetector.extract_feat))(params, frame)


@jax.jit
def step_rpn_nms(p, nf):
    cls, reg = model.apply(p, nf, method=SelsaDetector.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou)
    return nf + 1e-12 * props.boxes.sum()


results["rpn_nms_ms"] = chain_time(step_rpn_nms, neck0)

# 3. roi extraction
rois0 = jnp.tile(jnp.asarray([[10.0, 10.0, 200.0, 150.0]]), (cfg.test_nms_post, 1))
binds = jnp.zeros((cfg.test_nms_post,), jnp.int32)


@jax.jit
def step_roi(p, ro):
    rf = model.apply(p, neck0[0], ro, binds, method=SelsaDetector.roi_feats)
    return ro + 1e-12 * rf.astype(jnp.float32).sum()


results["roi_feats_ms"] = chain_time(step_roi, rois0)

# 4. kv-cached fused head
s, ppost = cfg.num_ref_frames, cfg.test_nms_post
kv = lambda: (jnp.zeros((16, s * ppost, 64), jnp.bfloat16),
              jnp.zeros((16, s * ppost, 64), jnp.bfloat16))
ref_kvs = (kv(), kv())
ref_mask = jnp.ones((s * ppost,), bool)
self_mask = jnp.ones((ppost,), bool)
rf0 = jax.random.normal(jax.random.PRNGKey(3), (ppost, 7, 7, 512))


@jax.jit
def step_head(p, rf):
    (cls, reg), _ = model.apply(
        p, rf, ref_kvs, ref_mask, self_mask,
        method=SelsaDetector.bbox_forward_cached_stream_kv)
    return rf + 1e-12 * cls.astype(jnp.float32).sum()


results["head_kv_ms"] = chain_time(step_head, rf0)

# 5. bbox decode (delta2bbox + multiclass matrix NMS window)
from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads import bbox_head as bh

cls0 = jax.random.normal(jax.random.PRNGKey(4), (ppost, cfg.num_classes + 1))
reg0 = jax.random.normal(jax.random.PRNGKey(5), (ppost, 4 * cfg.num_classes)) * 0.1
scale_factor = jnp.asarray([1.0, 1.0, 1.0, 1.0])
roi_valid = jnp.ones((ppost,), bool)


@jax.jit
def step_decode(p, cl):
    dets = bh.bbox_decode(
        rois0, cl, reg0, img_shape, roi_valid=roi_valid,
        scale_factor=scale_factor, nms_pre=cfg.det_nms_pre)
    return cl + 1e-12 * dets.scores.sum()


results["decode_nms_ms"] = chain_time(step_decode, cls0)

print(json.dumps({k: round(v, 3) for k, v in results.items()}))
