"""FGFA and DFF video detectors (flow-based feature propagation).

Parity targets:
- FGFA: mmtracking/mmtrack/models/vid/fgfa.py:31-469 — FlowNetSimple flow
  from key to each ref frame, ``flow_warp_feats`` warp of ref backbone
  features, EmbedAggregator cosine-weighted fusion, then standard Faster
  R-CNN training/inference on the aggregated key feature. (The reference file
  as committed crashes on a commented-out noise import at L8/L142 — that bug
  is intentionally not replicated.)
- DFF: mmtrack/models/vid/dff.py:17-278 — features computed on key frames
  only and flow-warped to non-key frames.

Streaming state for both is an explicit pytree carried through a jitted
step, replacing the reference's mutable ``self.memo``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import flow_warp_feats
from ..dense_heads import rpn_head as rpn
from ..detectors.faster_rcnn import FasterRCNN
from ..motion.flownet_simple import EmbedAggregator, FlowNetSimple
from ..roi_heads import bbox_head as bh
from .selsa import SelsaConfig, TrainBatch, make_anchors


class FGFA(nn.Module):
    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        self.detector = FasterRCNN(cfg=self.cfg, name="detector")
        self.motion = FlowNetSimple(img_scale_factor=0.5, name="motion")
        self.aggregator = EmbedAggregator(
            channels=self.cfg.neck_channels, name="aggregator"
        )

    def extract_feat(self, imgs):
        return self.detector.extract_feat(imgs)

    def compute_flow(self, key_img, ref_imgs):
        """key_img: [H, W, 3]; ref_imgs: [R, H, W, 3] -> flow [R, h', w', 2]."""
        r = ref_imgs.shape[0]
        pairs = jnp.concatenate(
            [jnp.broadcast_to(key_img[None], ref_imgs.shape), ref_imgs], axis=-1
        )
        return self.motion(pairs)

    def aggregate(self, key_feat, ref_feats, flows):
        """Warp each ref feature by its flow and cosine-fuse with the key.

        key_feat: [h, w, C]; ref_feats: [R, h, w, C]; flows: [R, H', W', 2].
        """
        warped = jax.vmap(flow_warp_feats)(ref_feats, flows)
        stack = jnp.concatenate([key_feat[None], warped], axis=0)
        return self.aggregator(key_feat[None], stack)[0]

    def __call__(self, imgs):
        feats_s, neck = self.extract_feat(imgs)
        flow = self.compute_flow(imgs[0], imgs[1:])
        agg = self.aggregate(neck[0], neck[1:], flow)
        cls, reg = self.detector.rpn_forward(agg[None])
        rf = self.detector.roi_feats(
            agg[None], jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 8),
            jnp.zeros((8,), jnp.int32),
        )
        return cls, reg, self.detector.bbox_forward(rf)


def fgfa_loss(model: FGFA, params, batch: TrainBatch, rng: jax.Array, anchors):
    """forward_train (fgfa.py:52-194, minus the broken noise call)."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.imgs, method=FGFA.extract_feat)
    flows = model.apply(params, batch.imgs[0], batch.imgs[1:], method=FGFA.compute_flow)
    agg = model.apply(params, neck[0], neck[1:], flows, method=FGFA.aggregate)

    cls, reg = model.apply(params, agg[None], method=lambda m, f: m.detector.rpn_forward(f))
    rpn_losses = rpn.rpn_loss(
        [(cls[0], reg[0])], [anchors], batch.gt_boxes, batch.gt_valid,
        rng_rpn, batch.img_shape,
    )
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    tgts = bh.bbox_targets(
        props.boxes, props.valid, batch.gt_boxes, batch.gt_labels,
        batch.gt_valid, rng_roi, num_classes=cfg.num_classes,
        num_samples=cfg.num_roi_samples,
    )
    rf = model.apply(
        params, agg[None], tgts.rois, jnp.zeros((tgts.rois.shape[0],), jnp.int32),
        method=lambda m, f, r, b: m.detector.roi_feats(f, r, b),
    )
    cls_score, bbox_pred = model.apply(
        params, rf, method=lambda m, x: m.detector.bbox_forward(x)
    )
    roi_losses = bh.bbox_loss(cls_score, bbox_pred, tgts, num_classes=cfg.num_classes)
    total = (rpn_losses.loss_cls + rpn_losses.loss_bbox
             + roi_losses.loss_cls + roi_losses.loss_bbox)
    return total, {
        "loss": total,
        "loss_rpn_cls": rpn_losses.loss_cls,
        "loss_rpn_bbox": rpn_losses.loss_bbox,
        "loss_cls": roi_losses.loss_cls,
        "loss_bbox": roi_losses.loss_bbox,
    }


class FGFAState(NamedTuple):
    """Streaming memo: raw neck features + the images that produced them
    (flow needs pixels), as a rolling window."""

    ref_imgs: jnp.ndarray  # [S, H, W, 3]
    ref_feats: jnp.ndarray  # [S, h, w, C]
    next_slot: jnp.ndarray  # [] int32


def fgfa_init_state(model: FGFA, params, ref_imgs: jnp.ndarray) -> FGFAState:
    _, neck = model.apply(params, ref_imgs, method=FGFA.extract_feat)
    return FGFAState(ref_imgs, neck, jnp.zeros((), jnp.int32))


def fgfa_inference_step(
    model: FGFA, params, state: FGFAState, frame: jnp.ndarray,
    img_shape, scale_factor, anchors, update_memo: bool = True,
):
    """One streamed frame: warp every memo feature to the current frame,
    aggregate, detect (fgfa.py simple_test)."""
    cfg = model.cfg
    _, neck = model.apply(params, frame[None], method=FGFA.extract_feat)
    key_feat = neck[0]
    flows = model.apply(params, frame, state.ref_imgs, method=FGFA.compute_flow)
    agg = model.apply(params, key_feat, state.ref_feats, flows, method=FGFA.aggregate)

    cls, reg = model.apply(params, agg[None], method=lambda m, f: m.detector.rpn_forward(f))
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    rf = model.apply(
        params, agg[None], props.boxes, jnp.zeros((props.boxes.shape[0],), jnp.int32),
        method=lambda m, f, r, b: m.detector.roi_feats(f, r, b),
    )
    cls_score, bbox_pred = model.apply(
        params, rf, method=lambda m, x: m.detector.bbox_forward(x)
    )
    dets = bh.bbox_decode(
        props.boxes, cls_score, bbox_pred, img_shape,
        roi_valid=props.valid, scale_factor=scale_factor,
    )
    if update_memo:
        slot = state.next_slot
        state = FGFAState(
            state.ref_imgs.at[slot].set(frame),
            state.ref_feats.at[slot].set(key_feat),
            (slot + 1) % state.ref_imgs.shape[0],
        )
    return state, dets


class DFF(nn.Module):
    """Deep Feature Flow: detect on key frames, warp features to non-key."""

    cfg: SelsaConfig = SelsaConfig()
    key_frame_interval: int = 10

    def setup(self):
        self.detector = FasterRCNN(cfg=self.cfg, name="detector")
        self.motion = FlowNetSimple(img_scale_factor=0.5, name="motion")

    def extract_feat(self, imgs):
        return self.detector.extract_feat(imgs)

    def warp_from_key(self, key_img, key_feat, frame):
        pair = jnp.concatenate([frame, key_img], axis=-1)[None]
        flow = self.motion(pair)[0]
        return flow_warp_feats(key_feat, flow)

    def __call__(self, imgs):
        _, neck = self.extract_feat(imgs)
        warped = self.warp_from_key(imgs[0], neck[0], imgs[-1])
        cls, reg = self.detector.rpn_forward(warped[None])
        rf = self.detector.roi_feats(
            warped[None], jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 8),
            jnp.zeros((8,), jnp.int32),
        )
        return cls, reg, self.detector.bbox_forward(rf)


def dff_loss(model: DFF, params, batch: TrainBatch, rng: jax.Array, anchors):
    """dff.py forward_train: ref frame (index 1) is the key; its features are
    warped to the annotated frame (index 0) and the detector trains on the
    warped features."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)
    _, neck = model.apply(params, batch.imgs[1:2], method=DFF.extract_feat)
    warped = model.apply(
        params, batch.imgs[1], neck[0], batch.imgs[0], method=DFF.warp_from_key
    )
    cls, reg = model.apply(
        params, warped[None], method=lambda m, f: m.detector.rpn_forward(f)
    )
    rpn_losses = rpn.rpn_loss(
        [(cls[0], reg[0])], [anchors], batch.gt_boxes, batch.gt_valid,
        rng_rpn, batch.img_shape,
    )
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    tgts = bh.bbox_targets(
        props.boxes, props.valid, batch.gt_boxes, batch.gt_labels,
        batch.gt_valid, rng_roi, num_classes=cfg.num_classes,
        num_samples=cfg.num_roi_samples,
    )
    rf = model.apply(
        params, warped[None], tgts.rois,
        jnp.zeros((tgts.rois.shape[0],), jnp.int32),
        method=lambda m, f, r, b: m.detector.roi_feats(f, r, b),
    )
    cls_score, bbox_pred = model.apply(
        params, rf, method=lambda m, x: m.detector.bbox_forward(x)
    )
    roi_losses = bh.bbox_loss(cls_score, bbox_pred, tgts, num_classes=cfg.num_classes)
    total = (rpn_losses.loss_cls + rpn_losses.loss_bbox
             + roi_losses.loss_cls + roi_losses.loss_bbox)
    return total, {"loss": total, "loss_rpn_cls": rpn_losses.loss_cls,
                   "loss_rpn_bbox": rpn_losses.loss_bbox,
                   "loss_cls": roi_losses.loss_cls,
                   "loss_bbox": roi_losses.loss_bbox}


class DFFState(NamedTuple):
    key_img: jnp.ndarray  # [H, W, 3]
    key_feat: jnp.ndarray  # [h, w, C]
    frames_since_key: jnp.ndarray  # [] int32


def dff_inference_step(
    model: DFF, params, state: DFFState, frame: jnp.ndarray,
    img_shape, scale_factor, anchors,
):
    """Key frames re-extract; others warp the cached key feature
    (dff.py simple_test). The key/non-key branch is a lax.cond so the whole
    clip still runs as one compiled program."""
    cfg = model.cfg
    is_key = state.frames_since_key % model.key_frame_interval == 0

    # both cond branches must agree on dtype: the neck emits compute_dtype
    # (bf16 on TPU) while the flow warp runs in f32 — pin the carried
    # feature to compute_dtype on both paths
    def key_branch(_):
        _, neck = model.apply(params, frame[None], method=DFF.extract_feat)
        return neck[0].astype(cfg.compute_dtype), frame

    def warp_branch(_):
        warped = model.apply(
            params, state.key_img, state.key_feat, frame, method=DFF.warp_from_key
        )
        return warped.astype(cfg.compute_dtype), state.key_img

    feat, key_img = jax.lax.cond(is_key, key_branch, warp_branch, None)
    new_state = DFFState(
        jnp.where(is_key, frame, state.key_img),
        jnp.where(is_key, feat, state.key_feat),
        state.frames_since_key + 1,
    )

    cls, reg = model.apply(params, feat[None], method=lambda m, f: m.detector.rpn_forward(f))
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    rf = model.apply(
        params, feat[None], props.boxes, jnp.zeros((props.boxes.shape[0],), jnp.int32),
        method=lambda m, f, r, b: m.detector.roi_feats(f, r, b),
    )
    cls_score, bbox_pred = model.apply(
        params, rf, method=lambda m, x: m.detector.bbox_forward(x)
    )
    dets = bh.bbox_decode(
        props.boxes, cls_score, bbox_pred, img_shape,
        roi_valid=props.valid, scale_factor=scale_factor,
    )
    return new_state, dets


def make_fgfa(cfg: Optional[SelsaConfig] = None):
    cfg = cfg or SelsaConfig()
    return FGFA(cfg=cfg), make_anchors(cfg)


def make_dff(cfg: Optional[SelsaConfig] = None, key_frame_interval: int = 10):
    cfg = cfg or SelsaConfig()
    return DFF(cfg=cfg, key_frame_interval=key_frame_interval), make_anchors(cfg)
