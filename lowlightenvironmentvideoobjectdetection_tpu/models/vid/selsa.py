"""SELSA video object detector — the framework's flagship model.

Capability parity with the reference:
- model assembly: mmtracking/configs/vid/selsa/selsa_faster_rcnn_r50_dc5_1x_
  imagenetvid.py (Faster R-CNN R50-DC5 + ChannelMapper + RPN + SelsaRoIHead).
- training: mmtrack/models/vid/selsa.py forward_train + SelsaRoIHead
  (selsa_roi_head.py:10-78): RPN loss on the key frame, proposals on key
  (train cfg, 600) and refs (test cfg, 300), sampled RoI head with cross-frame
  attention against all reference rois.
- streaming test: selsa.py:203-260 — the mutable ``self.memo`` becomes an
  explicit ``VideoState`` pytree threaded through a jitted step function, so a
  whole clip runs on-device with zero host round-trips.

TPU-first deviations (same math, better mapping):
- The reference re-runs the reference-frame FC path every frame at test time;
  here the memo caches the per-FC reference activations (see
  Shared2FCBBoxHead.ref_transform), computed once per reference frame.
- All shapes static: fixed proposal counts with validity masks; images padded
  to a fixed bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import AnchorGenerator
from ...ops.roi_align import roi_align
from ..backbones.resnet import ResNet
from ..dense_heads import rpn_head as rpn
from ..necks.channel_mapper import ChannelMapper
from ..roi_heads import bbox_head as bh


@dataclasses.dataclass(frozen=True)
class SelsaConfig:
    """Static configuration (shapes are compile-time constants)."""

    depth: int = 50
    num_classes: int = 30
    neck_channels: int = 512
    # canonical DC5 RPN: scales [4,8,16,32] x ratios [.5,1,2] at stride 16
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    stride: int = 16
    # image bucket (padded), divisible by 32: reference trains at (1000, 600)
    pad_h: int = 608
    pad_w: int = 1024
    # proposals. TRAINING default follows the reference exactly (rpn nms_pre
    # 6000, faster_rcnn_r50_dc5.py:25-29): the proposal pool feeds the
    # sampled-negative distribution, and 2000-vs-6000 equivalence was only
    # ever measured for inference recall (tools/bench_nms_pre.py), not the
    # training distribution (VERDICT r3 #10). Inference keeps the measured
    # 2000 window.
    train_nms_pre: int = 6000
    train_nms_post: int = 600
    test_nms_pre: int = 2000
    test_nms_post: int = 300
    rpn_nms_iou: float = 0.7
    # multiclass-NMS candidate window at decode (rois x classes candidates):
    # 2048 = perf sweet spot; parity runs set >= rois*classes for an
    # unbounded window (see bbox_head.bbox_decode)
    det_nms_pre: int = 2048
    num_roi_samples: int = 256
    # streaming memo
    num_ref_frames: int = 14
    # dtypes
    compute_dtype: Any = jnp.bfloat16
    # bbox-head matmul dtype (None = follow compute_dtype): bf16 runs the
    # 25088->1024 FCs and the SELSA attention on the MXU at full rate;
    # logits are cast to f32 downstream
    head_dtype: Any = None
    # training backbone stage outputs exposed for feature-consistency losses
    out_indices: Tuple[int, ...] = (3,)
    # None = plain ResNet; else a dark-backbone variant name from
    # backbones.dark_resnet.DARK_VARIANTS (DarkResNet, ResNet_A, ResNetC, ...)
    backbone_variant: Any = None
    backbone_in_channels: int = 3
    # extra DarkResNet ctor overrides as a (key, value) tuple-of-pairs
    # (hashable): e.g. the insert-plugins configs pass plugin_stages and
    # plugin_type="aggregator" with rdb/taf knobs (reference
    # insert_resnet.py:93-97)
    backbone_overrides: Tuple[Tuple[str, Any], ...] = ()
    # stages to freeze (reference default 1, for ImageNet-pretrained warm
    # starts); -1 trains everything (needed when training from scratch)
    frozen_stages: int = 1
    # key-frame RoI extractor: 'single' (plain RoIAlign,
    # single_level_roi_extractor.py) or 'temporal' (TemporalRoIAlign with
    # most-similar-point gather + temporal attention over the reference
    # feature maps — the reference's selsa_troialign / llvod "selsa_tra"
    # configs, temporal_roi_align.py:9-207). Reference rois always use the
    # plain path (the reference passes ref_feats=None for them).
    roi_extractor: str = "single"
    troi_similar_points: int = 2
    troi_attention_blocks: int = 4
    # shared FCs in the bbox head (one SELSA aggregator per FC): plain SELSA
    # configs use 2 (selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py:14); the
    # TemporalRoIAlign / llvod configs use 3 (llvod_*.py:60)
    num_shared_fcs: int = 2
    # 'xla' (separable-matmul, default) or 'pallas' (VMEM-resident kernel)
    roi_align_impl: str = "xla"
    # space-to-depth stem conv (backbones/resnet.py StemConv): exact same
    # math as the plain 7x7/2 stem, ~4x better MXU utilization on the
    # 3/4-channel input
    stem_s2d: bool = True
    # fused packed stem (conv1+pool over a 2x2-packed 256-channel layout,
    # see backbones/resnet.py stem_packed_maxpool); supersedes stem_s2d when
    # the padded image is divisible by 4. Measured 5.7% SLOWER end-to-end
    # than the s2d stem at DC5 streaming shapes (287 vs 304 fps same-session
    # A/B): the 9x9/stride-4 formulation does 1.65x the MACs of the 7x7/2
    # conv and the saved layout copies don't pay for them — kept opt-in.
    stem_fused: bool = False
    # rematerialize the backbone in the training backward pass (HBM saver at
    # full resolution). True/"full" = jax.checkpoint (recompute everything);
    # "dots" = checkpoint with dots_with_no_batch_dims_saveable — matmul/conv
    # outputs are SAVED and only the cheap elementwise/norm ops recompute,
    # trading a little HBM for most of the recompute FLOPs (the round-5
    # training-MFU lever). False skips jax.checkpoint — used by the
    # multi-chip CPU dryrun where the doubled backward HLO only slows
    # XLA-CPU compile. Round-5 on-chip A/B at the reference training shapes
    # (608x1024, 3 frames): False = 17.38 steps/s @ 4.12 GB HBM vs
    # True = 15.60 @ 2.77 GB and "dots" = 15.23 — the backbone recompute
    # buys memory SELSA doesn't need, so no-remat is the default; the
    # 5-stage paired-input flagship (10.7 GB with remat) overrides to True.
    remat: Any = False
    # packed-input streaming contract: the model consumes frames already
    # space-to-depth packed by the host pipeline alongside normalize/pad
    # (like the MLPerf ResNet TPU submissions' conv0 transform). Level 1 =
    # pack_frame once, [H/2, W/2, 4C] (the ~370 us/frame on-device repack
    # disappears); level 2 = pack_frame twice, [H/4, W/4, 16C] (conv1 runs
    # as a dense 3x3 48->256 conv + packed maxpool — whole stem 543 -> 175
    # us measured). True == 1.
    input_packed: int = 0

    @property
    def feat_hw(self) -> Tuple[int, int]:
        return (self.pad_h // self.stride, self.pad_w // self.stride)

    @property
    def num_base_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)


class SelsaDetector(nn.Module):
    """Backbone + neck + RPN + SELSA bbox head as one parameter tree."""

    cfg: SelsaConfig = SelsaConfig()

    def setup(self):
        c = self.cfg
        if c.backbone_variant is not None:
            from ..backbones.dark_resnet import make_dark_backbone

            self.backbone = make_dark_backbone(
                c.backbone_variant,
                depth=c.depth,
                in_channels=c.backbone_in_channels,
                strides=(1, 2, 2, 1),
                dilations=(1, 1, 1, 2),
                out_indices=c.out_indices,
                frozen_stages=c.frozen_stages,
                dtype=c.compute_dtype,
                name="backbone",
                **{k: v for k, v in c.backbone_overrides},
            )
        else:
            self.backbone = ResNet(
                depth=c.depth,
                in_channels=c.backbone_in_channels,
                strides=(1, 2, 2, 1),
                dilations=(1, 1, 1, 2),
                out_indices=c.out_indices,
                frozen_stages=c.frozen_stages,
                dtype=c.compute_dtype,
                stem_s2d=c.stem_s2d,
                stem_fused=c.stem_fused,
                input_packed=c.input_packed,
                name="backbone",
            )
        self.neck = ChannelMapper(
            out_channels=c.neck_channels, kernel_size=3, num_levels=1,
            dtype=c.compute_dtype, name="neck",
        )
        self.rpn_head = rpn.RPNHead(
            feat_channels=c.neck_channels,
            num_base_anchors=c.num_base_anchors,
            dtype=c.compute_dtype,
            name="rpn_head",
        )
        self.bbox_head = bh.Shared2FCBBoxHead(
            num_classes=c.num_classes,
            num_shared_fcs=c.num_shared_fcs,
            with_selsa=True,
            dtype=c.head_dtype if c.head_dtype is not None else c.compute_dtype,
            name="bbox_head",
        )
        if c.roi_extractor == "temporal":
            from ..roi_heads.temporal_roi_align import TemporalRoIAlign

            self.troi = TemporalRoIAlign(
                out_channels=c.neck_channels,
                num_most_similar_points=c.troi_similar_points,
                num_temporal_attention_blocks=c.troi_attention_blocks,
                dtype=c.compute_dtype,
                name="troi",
            )

    def extract_feat(self, imgs: jnp.ndarray):
        """imgs: [T, H, W, 3] normalized. Returns (stage_feats, neck_feat)
        where neck_feat is [T, h, w, C] (single DC5 level)."""
        stage_feats = self.backbone(imgs)
        neck_feat = self.neck(stage_feats[-1:])[0]
        return stage_feats, neck_feat

    def rpn_forward(self, neck_feat: jnp.ndarray):
        """neck_feat: [T, h, w, C] -> (cls [T, h, w, A], reg [T, h, w, 4A])."""
        return self.rpn_head([neck_feat])[0]

    def roi_feats(self, neck_feat, rois, batch_inds):
        """RoIAlign 7x7 at stride 16 (aligned, sampling_ratio=2).

        ``cfg.roi_align_impl='pallas'`` switches the single-image TPU path
        to the VMEM-resident Pallas kernel (ops/roi_align_pallas.py) —
        exact vs the XLA form, but measured ~5% slower end-to-end on the
        tunneled v5e (the kernel re-fetches the 2.5 MB neck map per grid
        step), so the XLA separable-matmul path stays the default.
        """
        single = neck_feat.ndim == 3 or neck_feat.shape[0] == 1
        if (single and self.cfg.roi_align_impl == "pallas"
                and jax.default_backend() == "tpu"):
            from ...ops.roi_align_pallas import roi_align_pallas

            f = neck_feat if neck_feat.ndim == 3 else neck_feat[0]
            return roi_align_pallas(
                f, rois, spatial_scale=1.0 / self.cfg.stride,
                out_size=7, sampling_ratio=2,
            )
        # no f32 up-cast: roi_align's interp now follows the feature dtype
        # (bf16 in production, f32 under the parity configs) — the bf16 neck
        # output carries no extra precision an f32 interp could preserve
        return roi_align(
            neck_feat,
            rois,
            spatial_scale=1.0 / self.cfg.stride,
            batch_inds=batch_inds,
            out_size=7,
            sampling_ratio=2,
        )

    def roi_feats_troi(self, neck_feat, rois, batch_inds, ref_maps):
        """Key-frame RoI features with TemporalRoIAlign aggregation over the
        reference frames' neck feature maps (temporal_roi_align.py:178-207:
        plain RoIAlign on the key map, then most-similar gather + temporal
        attention against ``ref_maps`` [S, h, w, C])."""
        rf = self.roi_feats(neck_feat, rois, batch_inds)
        return self.troi(rf, ref_maps)

    def bbox_forward(self, x, ref_x, ref_mask):
        return self.bbox_head(x, ref_x, ref_mask)

    def ref_transform(self, ref_x):
        return self.bbox_head.ref_transform(ref_x)

    def ref_transform_kv(self, ref_x):
        return self.bbox_head.ref_transform_kv(ref_x)

    def bbox_forward_cached_stream_kv(self, x, ref_kvs, ref_mask, self_mask):
        return self.bbox_head.forward_cached_stream_kv(
            x, ref_kvs, ref_mask, self_mask)

    def bbox_forward_cached(self, x, ref_stages, ref_mask):
        return self.bbox_head.forward_cached(x, ref_stages, ref_mask)

    def bbox_forward_cached_stream(self, x, ref_stages, ref_mask, self_mask):
        return self.bbox_head.forward_cached_stream(
            x, ref_stages, ref_mask, self_mask)

    def __call__(self, imgs: jnp.ndarray):
        """Init/inspection path: runs every submodule once."""
        _, neck_feat = self.extract_feat(imgs)
        rpn_out = self.rpn_forward(neck_feat)
        dummy_rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 8)
        dummy_binds = jnp.zeros((8,), jnp.int32)
        if self.cfg.roi_extractor == "temporal":
            rf = self.roi_feats_troi(neck_feat, dummy_rois, dummy_binds,
                                     neck_feat)
        else:
            rf = self.roi_feats(neck_feat, dummy_rois, dummy_binds)
        cls, reg = self.bbox_forward(rf, rf, jnp.ones((8,), bool))
        return rpn_out, cls, reg


# ---------------------------------------------------------------------------
# Functional system: anchors, training loss, streaming inference.
# ---------------------------------------------------------------------------


def make_anchors(cfg: SelsaConfig) -> jnp.ndarray:
    gen = AnchorGenerator(
        strides=[cfg.stride], ratios=list(cfg.anchor_ratios),
        scales=list(cfg.anchor_scales),
    )
    return jnp.asarray(gen.grid_anchors([cfg.feat_hw])[0])


class TrainBatch(NamedTuple):
    """One video training sample (key frame + R reference frames)."""

    imgs: jnp.ndarray  # [1+R, H, W, 3] normalized, padded; index 0 = key
    img_shape: jnp.ndarray  # [2] (h, w) of the un-padded content
    gt_boxes: jnp.ndarray  # [G, 4] key-frame gts (padded)
    gt_labels: jnp.ndarray  # [G]
    gt_valid: jnp.ndarray  # [G] bool


def selsa_loss(
    model: SelsaDetector,
    params,
    batch: TrainBatch,
    rng: jax.Array,
    anchors: jnp.ndarray,
):
    """Single-sample SELSA training loss (reference selsa.py forward_train)."""
    cfg = model.cfg
    rng_rpn, rng_roi = jax.random.split(rng)

    if cfg.remat == "dots":
        _remat = lambda f: jax.checkpoint(
            f, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif cfg.remat:
        _remat = jax.checkpoint
    else:
        _remat = lambda f: f
    extract = _remat(
        lambda p, imgs: model.apply(p, imgs, method=SelsaDetector.extract_feat)
    )
    _, neck_feat = extract(params, batch.imgs)
    cls_all, reg_all = model.apply(params, neck_feat, method=SelsaDetector.rpn_forward)

    # RPN loss on the key frame
    rpn_losses = rpn.rpn_loss(
        [(cls_all[0], reg_all[0])], [anchors],
        batch.gt_boxes, batch.gt_valid, rng_rpn, batch.img_shape,
    )

    # proposals: key with train cfg, refs with test cfg
    key_props = rpn.rpn_proposals(
        [(cls_all[0], reg_all[0])], [anchors], batch.img_shape,
        nms_pre=cfg.train_nms_pre, nms_post=cfg.train_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    num_refs = batch.imgs.shape[0] - 1

    def ref_prop(i):
        return rpn.rpn_proposals(
            [(cls_all[i + 1], reg_all[i + 1])], [anchors], batch.img_shape,
            nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
            iou_threshold=cfg.rpn_nms_iou,
        )
    ref_props = jax.lax.map(ref_prop, jnp.arange(num_refs))
    # ref_props.boxes: [R, 300, 4]

    # RoI head targets on the key frame
    tgts = bh.bbox_targets(
        key_props.boxes, key_props.valid,
        batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        rng_roi, num_classes=cfg.num_classes, num_samples=cfg.num_roi_samples,
    )

    key_binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    if cfg.roi_extractor == "temporal":
        # reference selsa_roi_head.py: the key rois aggregate over the ref
        # frames' feature maps; ref rois use the plain path (ref_feats=None)
        key_rois_feats = model.apply(
            params, neck_feat[0], tgts.rois, key_binds, neck_feat[1:],
            method=SelsaDetector.roi_feats_troi,
        )
    else:
        key_rois_feats = model.apply(
            params, neck_feat[0], tgts.rois, key_binds,
            method=SelsaDetector.roi_feats,
        )
    ref_rois = ref_props.boxes.reshape(-1, 4)
    ref_binds = jnp.repeat(jnp.arange(num_refs, dtype=jnp.int32), cfg.test_nms_post)
    ref_rois_feats = model.apply(
        params, neck_feat[1:], ref_rois, ref_binds, method=SelsaDetector.roi_feats
    )
    ref_mask = ref_props.valid.reshape(-1)

    cls_score, bbox_pred = model.apply(
        params, key_rois_feats, ref_rois_feats, ref_mask,
        method=SelsaDetector.bbox_forward,
    )
    roi_losses = bh.bbox_loss(cls_score, bbox_pred, tgts, num_classes=cfg.num_classes)

    total = (
        rpn_losses.loss_cls + rpn_losses.loss_bbox
        + roi_losses.loss_cls + roi_losses.loss_bbox
    )
    metrics = {
        "loss": total,
        "loss_rpn_cls": rpn_losses.loss_cls,
        "loss_rpn_bbox": rpn_losses.loss_bbox,
        "loss_cls": roi_losses.loss_cls,
        "loss_bbox": roi_losses.loss_bbox,
        "acc": roi_losses.acc,
    }
    return total, metrics


class VideoState(NamedTuple):
    """Streaming memo: cached per-FC reference K/V projections + validity.

    Replaces the reference's mutable ``self.memo`` (selsa.py:226-259). Slots
    roll circularly for fix-stride mode; adaptive-stride fills all slots at
    frame 0 and keeps them. Caching the aggregator's K/V projections (not raw
    activations) removes two 1024x1024 matmuls over ~4200 ref rois from every
    streamed frame — the projections only depend on the reference frames.

    K/V are stored HEAD-MAJOR ([nb, S, P, hd], nb=16 attention heads): the
    fused attention kernel's native operand layout, so the per-frame flatten
    to [nb, S*P, hd] is a free reshape — storing [S, P, C] flat cost ~0.3 ms
    per frame in XLA head-split transposes of the ~4500-roi cache.
    """

    # per shared-FC stage: (k [nb, S, P, hd], v [nb, S, P, hd])
    ref_kv: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    ref_valid: jnp.ndarray  # [S, P] bool
    next_slot: jnp.ndarray  # [] int32 (fix-stride rolling pointer)
    # reference neck feature maps [S, h, w, C], kept only when the key-roi
    # extractor is TemporalRoIAlign (the temporal attention re-reads the raw
    # maps each frame); None for the plain extractor
    ref_maps: Optional[jnp.ndarray] = None


def cast_params_for_inference(params):
    """Cast weight matrices/tensors (ndim >= 2) to bf16 for inference.

    The modules compute in bf16 (SelsaConfig.compute_dtype) but flax casts
    per-use — with f32-stored params every frame re-reads ~120 MB of f32
    weights from HBM and casts in-fusion (xprof: the conv/FC fusions' largest
    inputs are the f32 kernels). Storing bf16 halves the weight stream:
    measured +8% streaming fps on v5e. Biases, BN scale/shift and other
    vectors stay f32 (they are tiny and feed f32 epilogue math). Numerics are
    identical to the per-use cast path. Inference only — training keeps f32
    master weights.
    """
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
        else x,
        params,
    )


def empty_video_state(cfg: "SelsaConfig", rng=None, dtype=None) -> VideoState:
    """A full-validity VideoState in the canonical memo layout (head-major
    [nb, S, P, hd], bf16 to match project_kv's output) — for benches,
    harnesses, and export tracing. With ``rng``, K/V are small random values;
    otherwise zeros."""
    from ..roi_heads.bbox_head import Shared2FCBBoxHead

    nb = Shared2FCBBoxHead.num_attention_blocks
    c = Shared2FCBBoxHead.fc_out_channels
    if dtype is None:
        dtype = cfg.head_dtype if cfg.head_dtype is not None else cfg.compute_dtype
    s, p = cfg.num_ref_frames, cfg.test_nms_post
    shape = (nb, s, p, c // nb)

    def one(i):
        if rng is None:
            return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        return ((jax.random.normal(jax.random.fold_in(rng, i), shape) * 0.1
                 ).astype(dtype),
                (jax.random.normal(jax.random.fold_in(rng, i + 10), shape) * 0.1
                 ).astype(dtype))

    return VideoState(
        ref_kv=(one(0), one(1)),
        ref_valid=jnp.ones((s, p), bool),
        next_slot=jnp.zeros((), jnp.int32),
    )


def init_video_state(
    model: SelsaDetector, params, ref_imgs: jnp.ndarray, img_shape, anchors
) -> VideoState:
    """Fill the memo from the (adaptive-stride sampled) reference frames.

    ref_imgs: [S, H, W, 3]. Everything here runs once per video.
    """
    cfg = model.cfg
    s = ref_imgs.shape[0]
    _, neck_feat = model.apply(params, ref_imgs, method=SelsaDetector.extract_feat)
    cls_all, reg_all = model.apply(params, neck_feat, method=SelsaDetector.rpn_forward)

    def one(i):
        return rpn.rpn_proposals(
            [(cls_all[i], reg_all[i])], [anchors], img_shape,
            nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
            iou_threshold=cfg.rpn_nms_iou,
        )
    props = jax.lax.map(one, jnp.arange(s))
    rois = props.boxes.reshape(-1, 4)
    binds = jnp.repeat(jnp.arange(s, dtype=jnp.int32), cfg.test_nms_post)
    rfeats = model.apply(params, neck_feat, rois, binds, method=SelsaDetector.roi_feats)
    kvs = model.apply(params, rfeats, method=SelsaDetector.ref_transform_kv)
    p = cfg.test_nms_post
    # head-major [nb, S*P, hd] -> [nb, S, P, hd] (free: axis-1 split)
    kvs = tuple(
        (k.reshape(k.shape[0], s, p, -1), v.reshape(v.shape[0], s, p, -1))
        for k, v in kvs)
    ref_maps = (neck_feat.astype(cfg.compute_dtype)
                if cfg.roi_extractor == "temporal" else None)
    return VideoState(kvs, props.valid, jnp.asarray(0, jnp.int32), ref_maps)


def inference_step(
    model: SelsaDetector,
    params,
    state: VideoState,
    frame: jnp.ndarray,
    img_shape,
    scale_factor,
    anchors,
    update_memo: bool = False,
    do_update=True,
) -> Tuple[VideoState, Any]:
    """One streamed frame: [H, W, 3] -> (new_state, DetResult).

    The CURRENT frame's reference activations are concatenated into the
    attention reference set, exactly as the reference test path does in both
    adaptive and fix-stride modes (mmtrack selsa.py:222-223, :256).

    With ``update_memo=True`` (fix-stride mode) the frame's reference
    activations also replace the oldest memo slot — but only when
    ``do_update`` (a traced bool) is set, so the caller can gate the roll on
    ``frame_id % frame_stride == 0`` (selsa.py:256, fix-stride schedule)
    without recompiling.
    """
    cfg = model.cfg
    _, neck_feat = model.apply(params, frame[None], method=SelsaDetector.extract_feat)
    (cls, reg) = model.apply(params, neck_feat, method=SelsaDetector.rpn_forward)
    props = rpn.rpn_proposals(
        [(cls[0], reg[0])], [anchors], img_shape,
        nms_pre=cfg.test_nms_pre, nms_post=cfg.test_nms_post,
        iou_threshold=cfg.rpn_nms_iou,
    )
    binds = jnp.zeros((props.boxes.shape[0],), jnp.int32)
    if cfg.roi_extractor == "temporal":
        rfeats = model.apply(
            params, neck_feat[0], props.boxes, binds, state.ref_maps,
            method=SelsaDetector.roi_feats_troi,
        )
    else:
        rfeats = model.apply(
            params, neck_feat[0], props.boxes, binds,
            method=SelsaDetector.roi_feats,
        )
    # head-major [nb, S, P, hd] -> [nb, S*P, hd]: a free reshape
    ref_kvs = tuple(
        (k.reshape(k.shape[0], -1, k.shape[-1]),
         v.reshape(v.shape[0], -1, v.shape[-1]))
        for k, v in state.ref_kv)
    ref_mask = state.ref_valid.reshape(-1)
    (cls_score, bbox_pred), cur_kvs = model.apply(
        params, rfeats, ref_kvs, ref_mask, props.valid,
        method=SelsaDetector.bbox_forward_cached_stream_kv,
    )
    dets = bh.bbox_decode(
        props.boxes, cls_score, bbox_pred, img_shape,
        roi_valid=props.valid, scale_factor=scale_factor,
        nms_pre=cfg.det_nms_pre,
    )

    if update_memo:
        do = jnp.asarray(do_update, bool)
        slot = state.next_slot
        # cur_kvs are head-major [nb, P, hd]; slots live on axis 1
        new_kv = tuple(
            (jnp.where(do, bk.at[:, slot].set(ck.astype(bk.dtype)), bk),
             jnp.where(do, bv.at[:, slot].set(cv.astype(bv.dtype)), bv))
            for (bk, bv), (ck, cv) in zip(state.ref_kv, cur_kvs)
        )
        new_valid = jnp.where(
            do, state.ref_valid.at[slot].set(props.valid), state.ref_valid
        )
        new_slot = jnp.where(
            do, (slot + 1) % state.ref_valid.shape[0], slot
        ).astype(slot.dtype)
        new_maps = state.ref_maps
        if new_maps is not None:
            new_maps = jnp.where(
                do, new_maps.at[slot].set(neck_feat[0].astype(new_maps.dtype)),
                new_maps,
            )
        state = VideoState(new_kv, new_valid, new_slot, new_maps)
    return state, dets


def inference_clip(
    model: SelsaDetector,
    params,
    state: VideoState,
    frames: jnp.ndarray,
    img_shape,
    scale_factor,
    anchors,
    update_memo: bool = False,
    frame_stride: int = 1,
):
    """Whole-clip streaming inference as ONE compiled program.

    frames: [T, H, W, 3]. ``lax.scan`` threads the memo through every frame —
    the reference's per-frame python loop with host round-trips
    (apis/test.py:14-75) becomes a single device-resident scan, so a clip
    costs one dispatch. With ``update_memo`` the fix-stride roll is gated on
    ``t % frame_stride == 0`` (coco_video_dataset.py:204-218 schedule).
    Returns (final_state, stacked DetResult with leading frame axis).
    """

    def step(st, xs):
        t, fr = xs
        st, dets = inference_step(
            model, params, st, fr, img_shape, scale_factor, anchors,
            update_memo=update_memo, do_update=(t % frame_stride == 0),
        )
        return st, dets

    ts = jnp.arange(frames.shape[0], dtype=jnp.int32)
    return jax.lax.scan(step, state, (ts, frames))


def inference_clip_batch(
    model: SelsaDetector,
    params,
    states: VideoState,
    frames: jnp.ndarray,
    img_shapes,
    scale_factors,
    anchors,
    update_memo: bool = False,
    frame_stride: int = 1,
):
    """Multi-stream batched clip inference: vmap of ``inference_clip`` over a
    leading stream axis (frames: [S, T, H, W, 3]; states/img_shapes/
    scale_factors batched likewise).

    TPU-first throughput design the reference structurally cannot express —
    it hard-requires samples_per_gpu==1 (selsa.py:133-134) — while one chip
    here serves S independent video streams per dispatch, keeping the MXU
    fed at production batch sizes."""
    def one(st, fr, ishape, sf):
        return inference_clip(
            model, params, st, fr, ishape, sf, anchors,
            update_memo=update_memo, frame_stride=frame_stride,
        )

    return jax.vmap(one)(states, frames, img_shapes, scale_factors)


def make_selsa(cfg: Optional[SelsaConfig] = None):
    """Build (model, anchors). Params come from ``init_params``."""
    cfg = cfg or SelsaConfig()
    model = SelsaDetector(cfg=cfg)
    anchors = make_anchors(cfg)
    return model, anchors


def init_params(model: SelsaDetector, rng: jax.Array, small: bool = False):
    """Initialize the full parameter tree with one tiny forward.

    Jitted: un-jitted flax init dispatches thousands of tiny ops, which is
    pathological over a remote-TPU tunnel (~75s vs <10s jitted)."""
    h, w = (64, 64) if small else (model.cfg.pad_h, model.cfg.pad_w)
    # flax shapes conv kernels from the init input: RAW models (RGGB stem)
    # must init with their 4-channel input
    c = model.cfg.backbone_in_channels
    lvl = int(model.cfg.input_packed)
    h, w, c = h >> lvl, w >> lvl, c * 4 ** lvl
    imgs = jnp.zeros((1, h, w, c), jnp.float32)
    return jax.jit(model.init)(rng, imgs)


@functools.partial(jax.jit, static_argnames=("model",))
def jit_inference_step(model, params, state, frame, img_shape, scale_factor, anchors):
    return inference_step(model, params, state, frame, img_shape, scale_factor, anchors)
