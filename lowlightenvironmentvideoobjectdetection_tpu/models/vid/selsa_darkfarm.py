"""SelsaDarkfarmDetect — the reference's main low-light method, TPU-native.

Parity target: mmtracking/mmtrack/models/vid/selsa_darkfarm_detect.py:23-584:
- Each training sample is a (noise, clean) channel-concatenated pair (6ch
  sRGB / 8ch RAW); split at L150-158.
- The detector backbone runs on the noisy frames with duplicated-stage
  ``out_indices`` (e.g. (0,1,2,3,3)) so it emits the stages for the
  feature-consistency loss plus the neck input — the modified
  ``TwoStageDetector.extract_feat`` trick (mmdetection two_stage.py:80-95).
- A frozen ResCleaner runs on the clean frames; per-stage L1/L2/SmoothL1
  ties noisy stage features to clean ones (L171-187, loss_type ctor arg L30).
- Then standard SELSA RPN + RoI training on the noisy features (L189-211).
- Test time ignores the clean branch entirely (streams noisy frames through
  the plain SELSA path) — reuse ``selsa.inference_step``.

Also covers the sibling variants as config degenerations:
- SelsaNoiseDetect / SelsaNoiseDarkfarmDetect (selsa_noise_detect.py:146):
  generate the pair on the fly from ``ops.noise`` and train WITHOUT the
  cleaner loss (``with_cleaner=False``).
- SelsaCleanDetect / SelsaCleanDarkfarmDetect: train on the clean half only
  (``branch='clean'``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses as L
from ..cleaners.resclean import ResCleaner
from ..dense_heads import rpn_head as rpn
from ..roi_heads import bbox_head as bh
from .selsa import SelsaConfig, SelsaDetector, TrainBatch, make_anchors


@dataclasses.dataclass(frozen=True)
class DarkfarmConfig:
    selsa: SelsaConfig = SelsaConfig(
        num_classes=8,  # DarkFarm farm classes
        out_indices=(0, 1, 2, 3, 3),  # stages 1-4 for the loss + neck input
        remat=True,  # paired 5-stage backbone: keep the HBM saver on
    )
    loss_type: str = "l1"  # 'l1' | 'l2' | 'smooth_l1'
    with_cleaner: bool = True
    in_channels: int = 3  # 4 for RAW (8ch pairs)
    # SelsaNewDarkfarmDetect: a Denoising2Aggregator between backbone and
    # heads, with dual feature losses `_u` (undenoised) and `_d` (denoised)
    # (selsa_new_darkfarm_detect.py:36,166,191-192)
    with_aggregator: bool = False
    # aggregator ablation flags (the reference's rdb/taf config-name axis:
    # llvod_l1234_fusion_add_i1234[_rdb][_taf]_darkfarm.py)
    agg_rdb: bool = True
    agg_taf: bool = True
    # TAF DCNv2 implementation: 'windowed' (on-chip fast path) or 'scan'
    # (unbounded offsets; ~3x cheaper XLA-CPU compile — the dryrun's pick)
    agg_dcn_impl: str = "windowed"
    # windowed-DCN offset clamp (feature-resolution pixels). On-chip A/B at
    # the reference training shapes: radius 2 = 0.602 steps/s (MFU 7.8%) vs
    # radius 3 = 0.401 — the window work scales (2r+3)^2 and the TAF's
    # temporal alignment between adjacent frames lives within a few feature
    # pixels (offsets come from a zero-init conv).
    agg_dcn_radius: int = 2
    # which feature-loss branches supervise when the aggregator is on:
    # 'both' (default), 'u' (undenoised only — llvod_l1234u_*), or
    # 'd' (denoised only — llvod_l1234d_*)
    dual_branch: str = "both"

    @property
    def loss_stages(self) -> Tuple[int, ...]:
        # all but the final (neck-input) entry feed the consistency loss
        return tuple(self.selsa.out_indices[:-1])

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        # bottleneck archs (R50+) expand 4x; basic-block (R18/34) do not —
        # matters for dryrun-width configs that thin the backbone to R18
        expansion = 4 if self.selsa.depth >= 50 else 1
        return tuple(64 * expansion * (2 ** i) for i in self.loss_stages)


class SelsaDarkfarmDetector(nn.Module):
    """SELSA detector + frozen cleaner branch in one parameter tree."""

    cfg: DarkfarmConfig = DarkfarmConfig()

    def setup(self):
        self.selsa = SelsaDetector(cfg=self.cfg.selsa, name="selsa")
        if self.cfg.with_cleaner:
            self.cleaner = ResCleaner(
                depth=self.cfg.selsa.depth,
                in_channels=self.cfg.in_channels,
                out_indices=self.cfg.loss_stages,
                dtype=self.cfg.selsa.compute_dtype,
                name="cleaner",
            )
        if self.cfg.with_aggregator:
            from ..aggregators.denoising_aggregator import Denoising2Aggregator

            stages = self.cfg.loss_stages
            chans = self.cfg.stage_channels
            # DC5 strides: stages run at /4,/8,/16,/16 — downsample where the
            # next stage halves resolution
            stage_stride = {0: 4, 1: 8, 2: 16, 3: 16}
            down = tuple(
                stage_stride[stages[k + 1]] > stage_stride[stages[k]]
                if k + 1 < len(stages) else False
                for k in range(len(stages))
            )
            out_ch = tuple(
                chans[k + 1] if k + 1 < len(chans)
                else self.cfg.selsa.neck_channels
                for k in range(len(chans))
            )
            self.aggregator = Denoising2Aggregator(
                in_channels=chans,
                mid_channels=tuple(max(c // 4, 64) for c in chans),
                out_channels=out_ch,
                rdb_blocks=(2,) * len(chans),
                channel_growth=(64,) * len(chans),
                taf_embs=(3,) * len(chans),
                downsample=down,
                with_rdb=(self.cfg.agg_rdb,) * len(chans),
                with_taf=(self.cfg.agg_taf,) * len(chans),
                dtype=self.cfg.selsa.compute_dtype,
                dcn_impl=self.cfg.agg_dcn_impl,
                dcn_radius=self.cfg.agg_dcn_radius,
                name="aggregator",
            )

    def denoise_feats(self, stage_feats, neck_feat):
        """Apply the Denoising2Aggregator: returns (denoised stage feats,
        denoised neck feat)."""
        d_stages, d_neck = self.aggregator(list(stage_feats), [neck_feat])
        return d_stages, d_neck[0]

    def extract_noise_feat(self, noise_imgs):
        return self.selsa.extract_feat(noise_imgs)

    def extract_clean_feat(self, clean_imgs):
        return self.cleaner(clean_imgs)

    def __call__(self, pair_imgs: jnp.ndarray):
        """Init path. pair_imgs: [T, H, W, 2C]."""
        c = self.cfg.in_channels
        noise, clean = pair_imgs[..., :c], pair_imgs[..., c:]
        stage_feats, neck_feat = self.selsa.extract_feat(noise)
        if self.cfg.with_aggregator:
            _, neck_feat = self.denoise_feats(stage_feats, neck_feat)
        rpn_out = self.selsa.rpn_forward(neck_feat)
        dummy_rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]] * 8)
        dummy_binds = jnp.zeros((8,), jnp.int32)
        if self.cfg.selsa.roi_extractor == "temporal":
            rf = self.selsa.roi_feats_troi(neck_feat, dummy_rois, dummy_binds,
                                           neck_feat)
        else:
            rf = self.selsa.roi_feats(neck_feat, dummy_rois, dummy_binds)
        out = self.selsa.bbox_forward(rf, rf, jnp.ones((8,), bool))
        if self.cfg.with_cleaner:
            self.cleaner(clean)
        return rpn_out, out


class DarkfarmBatch(NamedTuple):
    """Key + R ref frames of channel-concatenated (noise, clean) pairs."""

    pair_imgs: jnp.ndarray  # [1+R, H, W, 2C]; index 0 = key
    img_shape: jnp.ndarray  # [2]
    gt_boxes: jnp.ndarray  # [G, 4] key-frame gts
    gt_labels: jnp.ndarray  # [G]
    gt_valid: jnp.ndarray  # [G]


_FEAT_LOSS = {"l1": L.l1_loss, "l2": L.mse_loss, "smooth_l1": L.smooth_l1_loss}


def darkfarm_loss(
    model: SelsaDarkfarmDetector,
    params,
    batch: DarkfarmBatch,
    rng: jax.Array,
    anchors: jnp.ndarray,
    branch: str = "noise",
):
    """Full training loss: per-stage feature consistency + RPN + SELSA RoI.

    ``branch='clean'`` trains the oracle baselines (SelsaCleanDetect) on the
    clean half instead; the cleaner loss is skipped in that case.
    """
    cfg = model.cfg
    scfg = cfg.selsa
    c = cfg.in_channels
    rng_rpn, rng_roi = jax.random.split(rng)

    det_in = batch.pair_imgs[..., :c] if branch == "noise" else batch.pair_imgs[..., c:]
    # rematerialize the backbone in the backward pass: at full resolution the
    # stored stage activations of 3 frames otherwise exhaust HBM
    _remat = jax.checkpoint if scfg.remat else (lambda f: f)
    extract = _remat(
        lambda p, imgs: model.apply(
            p, imgs, method=SelsaDarkfarmDetector.extract_noise_feat)
    )
    stage_feats, neck_feat = extract(params, det_in)

    metrics = {}
    total = 0.0
    denoised_stages = None
    if cfg.with_aggregator:
        denoise = _remat(
            lambda p, sf, nf: model.apply(
                p, sf, nf, method=SelsaDarkfarmDetector.denoise_feats)
        )
        denoised_stages, neck_feat = denoise(params, stage_feats, neck_feat)
    if cfg.with_cleaner and branch == "noise":
        clean_imgs = batch.pair_imgs[..., c:]
        clean_extract = _remat(
            lambda p, imgs: model.apply(
                p, imgs, method=SelsaDarkfarmDetector.extract_clean_feat)
        )
        clean_feats = clean_extract(params, clean_imgs)
        feat_loss_fn = _FEAT_LOSS[cfg.loss_type]
        # all but the duplicated last entry supervise; computed over ALL
        # frames (key + refs), plain mean, as the reference (L171-187).
        # With the aggregator, BOTH the undenoised (`_u`) and denoised (`_d`)
        # stage features are tied to the clean teacher (ref L191-192).
        for i in range(len(cfg.loss_stages)):
            clean_i = clean_feats[i].astype(jnp.float32)
            if cfg.dual_branch in ("both", "u") or denoised_stages is None:
                fl = feat_loss_fn(stage_feats[i].astype(jnp.float32), clean_i)
                suffix = "_u" if cfg.with_aggregator else ""
                metrics[f"loss_{cfg.loss_type}_{i}{suffix}"] = fl
                total = total + fl
            if denoised_stages is not None and cfg.dual_branch in ("both",
                                                                   "d"):
                fd = feat_loss_fn(
                    denoised_stages[i].astype(jnp.float32), clean_i
                )
                metrics[f"loss_{cfg.loss_type}_{i}_d"] = fd
                total = total + fd

    cls_all, reg_all = model.apply(
        params, neck_feat, method=lambda m, nf: m.selsa.rpn_forward(nf)
    )
    rpn_losses = rpn.rpn_loss(
        [(cls_all[0], reg_all[0])], [anchors],
        batch.gt_boxes, batch.gt_valid, rng_rpn, batch.img_shape,
    )
    key_props = rpn.rpn_proposals(
        [(cls_all[0], reg_all[0])], [anchors], batch.img_shape,
        nms_pre=scfg.train_nms_pre, nms_post=scfg.train_nms_post,
        iou_threshold=scfg.rpn_nms_iou,
    )
    num_refs = batch.pair_imgs.shape[0] - 1

    def ref_prop(i):
        return rpn.rpn_proposals(
            [(cls_all[i + 1], reg_all[i + 1])], [anchors], batch.img_shape,
            nms_pre=scfg.test_nms_pre, nms_post=scfg.test_nms_post,
            iou_threshold=scfg.rpn_nms_iou,
        )
    ref_props = jax.lax.map(ref_prop, jnp.arange(num_refs))

    tgts = bh.bbox_targets(
        key_props.boxes, key_props.valid,
        batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        rng_roi, num_classes=scfg.num_classes, num_samples=scfg.num_roi_samples,
    )
    key_binds = jnp.zeros((tgts.rois.shape[0],), jnp.int32)
    if scfg.roi_extractor == "temporal":
        # key rois aggregate over the ref frames' neck maps via
        # TemporalRoIAlign (reference llvod configs); ref rois stay plain
        key_rf = model.apply(
            params, neck_feat[0], tgts.rois, key_binds, neck_feat[1:],
            method=lambda m, f, r, b, rm: m.selsa.roi_feats_troi(f, r, b, rm),
        )
    else:
        key_rf = model.apply(
            params, neck_feat[0], tgts.rois, key_binds,
            method=lambda m, f, r, b: m.selsa.roi_feats(f, r, b),
        )
    ref_rois = ref_props.boxes.reshape(-1, 4)
    ref_binds = jnp.repeat(jnp.arange(num_refs, dtype=jnp.int32), scfg.test_nms_post)
    ref_rf = model.apply(
        params, neck_feat[1:], ref_rois, ref_binds,
        method=lambda m, f, r, b: m.selsa.roi_feats(f, r, b),
    )
    cls_score, bbox_pred = model.apply(
        params, key_rf, ref_rf, ref_props.valid.reshape(-1),
        method=lambda m, x, rx, mk: m.selsa.bbox_forward(x, rx, mk),
    )
    roi_losses = bh.bbox_loss(cls_score, bbox_pred, tgts, num_classes=scfg.num_classes)

    total = (
        total + rpn_losses.loss_cls + rpn_losses.loss_bbox
        + roi_losses.loss_cls + roi_losses.loss_bbox
    )
    metrics.update(
        loss=total,
        loss_rpn_cls=rpn_losses.loss_cls,
        loss_rpn_bbox=rpn_losses.loss_bbox,
        loss_cls=roi_losses.loss_cls,
        loss_bbox=roi_losses.loss_bbox,
        acc=roi_losses.acc,
    )
    return total, metrics


def make_darkfarm(cfg: Optional[DarkfarmConfig] = None):
    cfg = cfg or DarkfarmConfig()
    model = SelsaDarkfarmDetector(cfg=cfg)
    anchors = make_anchors(cfg.selsa)
    return model, anchors


def init_darkfarm_params(model: SelsaDarkfarmDetector, rng: jax.Array,
                         height: int = 64, width: int = 64):
    pair = jnp.zeros((1, height, width, 2 * model.cfg.in_channels), jnp.float32)
    return jax.jit(model.init)(rng, pair)
