#!/usr/bin/env python
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Component-level timing of the SELSA streaming step on the real TPU."""
import time, json
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
    SelsaConfig, SelsaDetector, init_params, make_anchors)
from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import rpn_head as rpn
from lowlightenvironmentvideoobjectdetection_tpu.ops.roi_align import roi_align

cfg = SelsaConfig()
model = SelsaDetector(cfg=cfg)
params = init_params(model, jax.random.PRNGKey(0), small=True)
anchors = make_anchors(cfg)
frame = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pad_h, cfg.pad_w, 3))
img_shape = jnp.asarray([600.0, 1000.0])

def timeit(f, *args, n=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

extract = jax.jit(lambda p, f: model.apply(p, f, method=SelsaDetector.extract_feat))
sf, neck = extract(params, frame)
t_extract = timeit(extract, params, frame)

rpnf = jax.jit(lambda p, nf: model.apply(p, nf, method=SelsaDetector.rpn_forward))
cls_all, reg_all = rpnf(params, neck)
t_rpn_fwd = timeit(rpnf, params, neck)

prop = jax.jit(lambda c, r: rpn.rpn_proposals(
    [(c[0], r[0])], [anchors], img_shape,
    nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
    iou_threshold=cfg.rpn_nms_iou))
props = prop(cls_all, reg_all)
t_prop = timeit(prop, cls_all, reg_all)

rois = props.boxes
binds = jnp.zeros((rois.shape[0],), jnp.int32)
ra = jax.jit(lambda nf, ro, bi: roi_align(
    nf.astype(jnp.float32), ro, spatial_scale=1.0/16, batch_inds=bi,
    out_size=7, sampling_ratio=2))
rf = ra(neck, rois, binds)
t_roi = timeit(ra, neck, rois, binds)

bbox = jax.jit(lambda p, x, rx, mk: model.apply(p, x, rx, mk,
               method=SelsaDetector.bbox_forward))
ref_rf = jnp.tile(rf, (14, 1, 1, 1))[: 14 * 300]
mask = jnp.ones((ref_rf.shape[0],), bool)
out = bbox(params, rf, ref_rf, mask)
t_bbox = timeit(bbox, params, rf, ref_rf, mask)

print(json.dumps(dict(extract_ms=round(t_extract, 2),
                      rpn_fwd_ms=round(t_rpn_fwd, 2),
                      proposals_nms_ms=round(t_prop, 2),
                      roi_align_ms=round(t_roi, 2),
                      selsa_bbox_head_ms=round(t_bbox, 2))))
