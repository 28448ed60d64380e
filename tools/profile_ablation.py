#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Marginal (in-context) stage costs of the streaming SELSA step.

Standalone per-component timing (tools/profile_chain.py) carries per-call
overheads and loses XLA's cross-stage overlap — its numbers sum to ~2x the
real step. This tool instead times the FULL streaming step with suffixes of
the pipeline ablated (decode dropped, head dropped, ...), using bench.py's
chained-differential methodology; successive differences give each stage's
true marginal cost inside the fused program.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.vid import selsa as S
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig, SelsaDetector, VideoState,
    cast_params_for_inference, init_params, make_anchors)
from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import (
    rpn_head as rpn)
from lowlightenvironmentvideoobjectdetection_tpu.models.roi_heads import (
    bbox_head as bh)

cfg = SelsaConfig()
model = SelsaDetector(cfg=cfg)
params = cast_params_for_inference(
    init_params(model, jax.random.PRNGKey(0), small=True))
anchors = make_anchors(cfg)
img_shape = jnp.asarray([600.0, 1000.0])
sf = jnp.asarray([1.0, 1.0, 1.0, 1.0])
state0 = S.empty_video_state(cfg, rng=jax.random.PRNGKey(1))
frame0 = jax.random.normal(jax.random.PRNGKey(2), (cfg.pad_h, cfg.pad_w, 3))


def stage_step(upto):
    """A streaming step truncated after `upto`; returns (state, scalar)."""

    def fn(params, anchors, state, frame, img_shape, sf):
        _, neck_feat = model.apply(params, frame[None],
                                   method=SelsaDetector.extract_feat)
        if upto == "extract":
            return state, neck_feat.astype(jnp.float32).sum()
        cls, reg = model.apply(params, neck_feat,
                               method=SelsaDetector.rpn_forward)
        if upto == "rpn_conv":
            return state, (cls.astype(jnp.float32).sum()
                           + reg.astype(jnp.float32).sum())
        props = rpn.rpn_proposals(
            [(cls[0], reg[0])], [anchors], img_shape,
            nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
            iou_threshold=cfg.rpn_nms_iou)
        if upto == "rpn_nms":
            return state, props.boxes.sum()
        binds = jnp.zeros((props.boxes.shape[0],), jnp.int32)
        rfeats = model.apply(params, neck_feat[0], props.boxes, binds,
                             method=SelsaDetector.roi_feats)
        if upto == "roi":
            return state, rfeats.astype(jnp.float32).sum()
        ref_kvs = tuple((k.reshape(k.shape[0], -1, k.shape[-1]),
                         v.reshape(v.shape[0], -1, v.shape[-1]))
                        for k, v in state.ref_kv)
        (cls_score, bbox_pred), _ = model.apply(
            params, rfeats, ref_kvs, state.ref_valid.reshape(-1), props.valid,
            method=SelsaDetector.bbox_forward_cached_stream_kv)
        if upto == "head":
            return state, (cls_score.astype(jnp.float32).sum()
                           + bbox_pred.astype(jnp.float32).sum())
        dets = bh.bbox_decode(props.boxes, cls_score, bbox_pred, img_shape,
                              roi_valid=props.valid, scale_factor=sf,
                              nms_pre=cfg.det_nms_pre)
        return state, dets.scores.sum()

    @jax.jit
    def step(params, anchors, state, frame, img_shape, sf):
        st, scalar = fn(params, anchors, state, frame, img_shape, sf)
        return st, scalar, frame + 1e-12 * scalar

    return step


def chain_fps(step):
    st, sc, fr = step(params, anchors, state0, frame0, img_shape, sf)
    float(jax.device_get(sc))

    def run(n):
        t0 = time.perf_counter()
        st, fr = state0, frame0
        for _ in range(n):
            st, sc, fr = step(params, anchors, st, fr, img_shape, sf)
        jax.device_get(sc)
        return time.perf_counter() - t0

    diffs = sorted(run(120) - run(20) for _ in range(3))
    return diffs[1] / 100.0 * 1000.0  # ms/step


STAGES = ["extract", "rpn_conv", "rpn_nms", "roi", "head", "decode"]
ms = {}
for st_name in STAGES:
    ms[st_name] = chain_fps(stage_step(st_name))

out = {"cum_ms": {k: round(v, 3) for k, v in ms.items()}}
marg = {}
prev = 0.0
for st_name in STAGES:
    marg[st_name] = round(ms[st_name] - prev, 3)
    prev = ms[st_name]
out["marginal_ms"] = marg
out["fps_full"] = round(1000.0 / ms["decode"], 1)
print(json.dumps(out))
