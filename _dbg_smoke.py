import sys, os
sys.path.insert(0, "tools")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, optax
from learning_smoke import make_sample
from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.faster_rcnn import (
    DetTrainBatch, faster_rcnn_detect, faster_rcnn_loss, make_faster_rcnn)
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import SelsaConfig

cfg = SelsaConfig(pad_h=96, pad_w=96, num_classes=2, compute_dtype=jnp.float32,
                  train_nms_pre=256, train_nms_post=64, test_nms_pre=256,
                  test_nms_post=64, num_roi_samples=64, anchor_scales=(1, 2, 3))
model, anchors = make_faster_rcnn(cfg)
rng = np.random.RandomState(0)
params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(2e-3))
opt_state = opt.init(params)

@jax.jit
def train_step(params, opt_state, batch, key):
    (loss, metrics), grads = jax.value_and_grad(
        lambda q: faster_rcnn_loss(model, q, batch, key, anchors), has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss, metrics

key = jax.random.PRNGKey(1)
for i in range(300):
    img, boxes, labels, valid = make_sample(rng)
    batch = DetTrainBatch(jnp.asarray(img), jnp.asarray([96.0, 96.0]),
                          jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid))
    key, sub = jax.random.split(key)
    params, opt_state, loss, metrics = train_step(params, opt_state, batch, sub)
print("final metrics:", {k: round(float(v), 4) for k, v in metrics.items()})

detect = jax.jit(lambda p, im: faster_rcnn_detect(
    model, p, im, jnp.asarray([96.0, 96.0]), anchors))
img, boxes, labels, valid = make_sample(np.random.RandomState(12345))
d = detect(params, jnp.asarray(img))
v = np.asarray(d.valid)
print("gt:", boxes[valid].tolist(), labels[valid].tolist())
print("num valid dets:", v.sum(), "max score:", float(np.asarray(d.scores).max()))
order = np.argsort(-np.asarray(d.scores))[:5]
for i in order:
    print("det:", np.asarray(d.boxes)[i].round(1).tolist(),
          "score", round(float(np.asarray(d.scores)[i]), 3),
          "label", int(np.asarray(d.labels)[i]), "valid", bool(v[i]))

from lowlightenvironmentvideoobjectdetection_tpu.models.detectors.faster_rcnn import FasterRCNN
from lowlightenvironmentvideoobjectdetection_tpu.models.dense_heads import rpn_head as rpn
_, neck = model.apply(params, jnp.asarray(img)[None], method=FasterRCNN.extract_feat)
cls, reg = model.apply(params, neck, method=FasterRCNN.rpn_forward)
props = jax.jit(lambda c, r: rpn.rpn_proposals(
    [(c[0], r[0])], [anchors], jnp.asarray([96.0, 96.0]),
    nms_pre=256, nms_post=64, iou_threshold=0.7))(cls, reg)
pb = np.asarray(props.boxes)
pv = np.asarray(props.valid)
print("proposals valid:", pv.sum())
print("top proposals:", pb[:4].round(1).tolist())
print("y ranges:", pb[pv][:, 1].min() if pv.sum() else None,
      pb[pv][:, 3].max() if pv.sum() else None)

print("=== gt rois through the test-time head ===")
rf = model.apply(params, neck[0], jnp.asarray(boxes[valid]),
                 jnp.zeros((int(valid.sum()),), jnp.int32),
                 method=FasterRCNN.roi_feats)
cls_s, reg_s = model.apply(params, rf, method=FasterRCNN.bbox_forward)
import jax.nn as jnn
probs = np.asarray(jnn.softmax(cls_s.astype(jnp.float32), axis=-1))
print("gt-roi class probs:", probs.round(3).tolist())
print("gt labels:", labels[valid].tolist())
