"""SiamRPN++ single-object tracking.

Parity targets:
- depthwise correlation: mmtracking/mmtrack/core/track/correlation.py:4-23.
- CorrelationHead / SiameseRPNHead: mmtrack/models/track_heads/
  siamese_rpn_head.py:13-76 / :76-470 — per-level kernel/search convs,
  depthwise xcorr, 1x1 head convs to 2A cls / 4A reg, (weighted) multi-level
  fusion, pos/neg pair target assignment, penalty+Hanning-window bbox pick.
- SiamRPN model: mmtrack/models/sot/siamrpn.py:13-420 — template ``init``,
  per-frame ``track`` on a scaled search crop, exemplar/search crop pyramid
  (``get_cropped_img``).

TPU-first: crops are ``jax.image.scale_and_translate`` (static output
shapes); template init and the per-frame track step are two jitted functions
with the template kernels as explicit state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import boxes as box_ops
from ..backbones.resnet import ResNet
from ..necks.channel_mapper import ChannelMapper


def depthwise_correlation(search: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """search: [H, W, C]; kernel: [h, w, C] -> [H-h+1, W-w+1, C].

    Per-channel valid cross-correlation (grouped conv with groups=C in the
    reference) expressed as a feature-dim batched conv.
    """
    # lhs [1, H, W, C], rhs HWIO with feature_group_count=C: [h, w, 1, C]
    out = jax.lax.conv_general_dilated(
        search[None].astype(jnp.float32),
        kernel[..., None].transpose(0, 1, 3, 2).astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=search.shape[-1],
    )
    return out[0]


class CorrelationHead(nn.Module):
    in_channels: int = 256
    mid_channels: int = 256
    out_channels: int = 10  # 2*A or 4*A
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kernel: jnp.ndarray, search: jnp.ndarray) -> jnp.ndarray:
        """kernel: [h, w, C] template feature; search: [H, W, C]."""
        k = nn.Conv(self.mid_channels, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="kernel_conv")(kernel)
        k = nn.relu(nn.LayerNorm(name="kernel_norm")(k))
        s = nn.Conv(self.mid_channels, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="search_conv")(search)
        s = nn.relu(nn.LayerNorm(name="search_norm")(s))
        corr = depthwise_correlation(s, k)
        h = nn.relu(nn.LayerNorm(name="head_norm")(
            nn.Conv(self.mid_channels, (1, 1), dtype=self.dtype, name="head_conv1")(corr)
        ))
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="head_conv2")(h)


@dataclasses.dataclass(frozen=True)
class SiamRPNConfig:
    exemplar_size: int = 127
    search_size: int = 255
    context_amount: float = 0.5
    feat_channels: int = 256
    anchor_scales: Tuple[int, ...] = (8,)
    anchor_ratios: Tuple[float, ...] = (0.33, 0.5, 1.0, 2.0, 3.0)
    anchor_stride: int = 8
    num_levels: int = 3  # backbone stages 2, 3, 4
    penalty_k: float = 0.05
    window_influence: float = 0.42
    lr: float = 0.38
    compute_dtype: Any = jnp.float32

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)


class SiamRPN(nn.Module):
    cfg: SiamRPNConfig = SiamRPNConfig()

    def setup(self):
        c = self.cfg
        self.backbone = ResNet(
            depth=50, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
            out_indices=(1, 2, 3), frozen_stages=1, dtype=c.compute_dtype,
            name="backbone",
        )
        self.neck = ChannelMapper(
            out_channels=c.feat_channels, kernel_size=1,
            num_levels=c.num_levels, dtype=c.compute_dtype, name="neck",
        )
        self.cls_heads = [
            CorrelationHead(c.feat_channels, c.feat_channels,
                            2 * c.num_anchors, name=f"cls_head{i}")
            for i in range(c.num_levels)
        ]
        self.reg_heads = [
            CorrelationHead(c.feat_channels, c.feat_channels,
                            4 * c.num_anchors, name=f"reg_head{i}")
            for i in range(c.num_levels)
        ]
        self.cls_weights = self.param(
            "cls_weights", nn.initializers.ones, (c.num_levels,)
        )
        self.reg_weights = self.param(
            "reg_weights", nn.initializers.ones, (c.num_levels,)
        )

    def extract_feat(self, img: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """img: [N, H, W, 3] -> per-level [N, h, w, C] neck feats."""
        return self.neck(self.backbone(img))

    def forward_heads(self, z_feats, x_feats):
        """Template/search per-level features -> fused (cls [H,W,2A],
        reg [H,W,4A]), averaged over levels with learnable softmax weights."""
        c = self.cfg
        cls_w = jax.nn.softmax(self.cls_weights)
        reg_w = jax.nn.softmax(self.reg_weights)
        cls_out = 0.0
        reg_out = 0.0
        for i in range(c.num_levels):
            # center 7x7 crop of the template feature (SiamRPN++ protocol)
            z = z_feats[i]
            ch, cw = z.shape[0] // 2, z.shape[1] // 2
            zc = jax.lax.dynamic_slice(
                z, (ch - 3, cw - 3, 0), (7, 7, z.shape[-1])
            )
            cls_out = cls_out + cls_w[i] * self.cls_heads[i](zc, x_feats[i])
            reg_out = reg_out + reg_w[i] * self.reg_heads[i](zc, x_feats[i])
        return cls_out, reg_out

    def __call__(self, z_img, x_img):
        z_feats = tuple(f[0] for f in self.extract_feat(z_img))
        x_feats = tuple(f[0] for f in self.extract_feat(x_img))
        return self.forward_heads(z_feats, x_feats)


# ---------------------------------------------------------------------------
# crops, anchors, track step
# ---------------------------------------------------------------------------


def crop_around(img: jnp.ndarray, center_xy, crop_size, out_size: int,
                pad_value) -> jnp.ndarray:
    """Resize a (possibly out-of-bounds) square crop centered at center_xy to
    out_size, padding with pad_value — get_cropped_img (siamrpn.py:101-166).
    """
    h, w, _ = img.shape
    cx, cy = center_xy[0], center_xy[1]
    scale = out_size / crop_size
    translation = (
        jnp.asarray([out_size / 2, out_size / 2])
        - jnp.asarray([cy, cx]) * scale
    )
    shifted = img - pad_value
    out = jax.image.scale_and_translate(
        shifted, (out_size, out_size, img.shape[-1]), (0, 1),
        jnp.asarray([scale, scale]), translation, "linear",
    )
    return out + pad_value


def exemplar_crop_size(bbox_cxcywh, context_amount: float):
    """z_size = sqrt((w + p)(h + p)), p = (w + h)/2 * context."""
    w, h = bbox_cxcywh[2], bbox_cxcywh[3]
    pad = (w + h) * context_amount
    return jnp.sqrt((w + pad) * (h + pad))


def sot_grid_anchors(cfg: SiamRPNConfig, score_size: int) -> np.ndarray:
    """[H*W*A, 4] cxcywh anchors centered on the correlation map
    (core/anchor/sot_anchor_generator.py semantics)."""
    a = []
    for r in cfg.anchor_ratios:
        for s in cfg.anchor_scales:
            base = cfg.anchor_stride * s
            w = base / np.sqrt(r)
            h = base * np.sqrt(r)
            a.append([w, h])
    wh = np.asarray(a, np.float32)  # [A, 2]
    disp = (np.arange(score_size, dtype=np.float32) - (score_size - 1) / 2) \
        * cfg.anchor_stride
    gx, gy = np.meshgrid(disp, disp)
    centers = np.stack([gx.ravel(), gy.ravel()], -1)  # [HW, 2]
    anchors = np.concatenate(
        [
            np.repeat(centers, len(wh), axis=0),
            np.tile(wh, (score_size * score_size, 1)),
        ],
        axis=1,
    )
    return anchors  # cxcywh relative to search-crop center


def hanning_window(score_size: int, num_anchors: int) -> np.ndarray:
    w = np.hanning(score_size)
    win2d = np.outer(w, w).ravel()
    return np.repeat(win2d, num_anchors).astype(np.float32)


class SOTState(NamedTuple):
    z_feats: Tuple[jnp.ndarray, ...]  # per-level template features
    bbox: jnp.ndarray  # [4] cxcywh in image coords


def sot_init(model: SiamRPN, params, img: jnp.ndarray, bbox_xyxy) -> SOTState:
    """Template initialization (siamrpn.py init, L175)."""
    cfg = model.cfg
    b = jnp.asarray(bbox_xyxy, jnp.float32)
    cxcywh = jnp.asarray(
        [(b[0] + b[2]) / 2, (b[1] + b[3]) / 2, b[2] - b[0], b[3] - b[1]]
    )
    z_size = exemplar_crop_size(cxcywh, cfg.context_amount)
    mean = jnp.mean(img, axis=(0, 1))
    z_crop = crop_around(img, cxcywh[:2], z_size, cfg.exemplar_size, mean)
    z_feats = model.apply(params, z_crop[None], method=SiamRPN.extract_feat)
    return SOTState(tuple(f[0] for f in z_feats), cxcywh)


def sot_track(model: SiamRPN, params, state: SOTState, img: jnp.ndarray,
              anchors: jnp.ndarray, window: jnp.ndarray):
    """One tracked frame (siamrpn.py track, L166-238). Returns
    (new_state, score, bbox_xyxy)."""
    cfg = model.cfg
    prev = state.bbox
    z_size = exemplar_crop_size(prev, cfg.context_amount)
    x_size = z_size * cfg.search_size / cfg.exemplar_size
    scale = cfg.exemplar_size / z_size

    mean = jnp.mean(img, axis=(0, 1))
    x_crop = crop_around(img, prev[:2], x_size, cfg.search_size, mean)
    x_feats = model.apply(params, x_crop[None], method=SiamRPN.extract_feat)
    cls, reg = model.apply(
        params, state.z_feats, tuple(f[0] for f in x_feats),
        method=SiamRPN.forward_heads,
    )
    hw = cls.shape[0] * cls.shape[1]
    a = cfg.num_anchors
    scores = jax.nn.softmax(
        cls.reshape(hw * a, 2), axis=-1
    )[:, 1]
    deltas = reg.reshape(hw * a, 4)
    anc_xyxy = jnp.stack(
        [
            anchors[:, 0] - anchors[:, 2] / 2, anchors[:, 1] - anchors[:, 3] / 2,
            anchors[:, 0] + anchors[:, 2] / 2, anchors[:, 1] + anchors[:, 3] / 2,
        ],
        axis=1,
    )
    pred = box_ops.delta2bbox(anc_xyxy, deltas)
    pw = pred[:, 2] - pred[:, 0]
    ph = pred[:, 3] - pred[:, 1]
    pcx = (pred[:, 0] + pred[:, 2]) / 2
    pcy = (pred[:, 1] + pred[:, 3]) / 2

    def change(r):
        return jnp.maximum(r, 1.0 / r)

    def ssz(w, h):
        pad = (w + h) * 0.5
        return jnp.sqrt((w + pad) * (h + pad))

    s_c = change(ssz(pw, ph) / ssz(prev[2] * scale, prev[3] * scale))
    r_c = change((prev[2] / prev[3]) / (pw / ph))
    penalty = jnp.exp(-(r_c * s_c - 1.0) * cfg.penalty_k)
    pscore = penalty * scores
    pscore = pscore * (1 - cfg.window_influence) + window * cfg.window_influence

    best = jnp.argmax(pscore)
    best_score = scores[best]
    lr = penalty[best] * best_score * cfg.lr

    # predicted box is relative to the crop center at `scale`; map back
    new_cx = prev[0] + pcx[best] / scale
    new_cy = prev[1] + pcy[best] / scale
    new_w = prev[2] * (1 - lr) + (pw[best] / scale) * lr
    new_h = prev[3] * (1 - lr) + (ph[best] / scale) * lr
    h_img, w_img, _ = img.shape
    new_cx = jnp.clip(new_cx, 0, w_img)
    new_cy = jnp.clip(new_cy, 0, h_img)
    new_w = jnp.clip(new_w, 10, w_img)
    new_h = jnp.clip(new_h, 10, h_img)
    new_bbox = jnp.stack([new_cx, new_cy, new_w, new_h])
    xyxy = jnp.stack(
        [new_cx - new_w / 2, new_cy - new_h / 2, new_cx + new_w / 2,
         new_cy + new_h / 2]
    )
    return SOTState(state.z_feats, new_bbox), best_score, xyxy


def siamrpn_loss(model: SiamRPN, params, z_img, x_img, gt_cxcywh,
                 anchors: jnp.ndarray, is_positive_pair,
                 pos_iou_thr=0.6, neg_iou_thr=0.3,
                 num_pos=16, num_total=64, rng=None):
    """Pair training loss (siamese_rpn_head targets + loss, L213-410):
    CE on sampled pos/neg anchors + L1 on positives, masked static-shape."""
    cls, reg = model.apply(params, z_img, x_img)
    hw = cls.shape[0] * cls.shape[1]
    a = model.cfg.num_anchors
    logits = cls.reshape(hw * a, 2).astype(jnp.float32)
    deltas = reg.reshape(hw * a, 4).astype(jnp.float32)

    anc_xyxy = jnp.stack(
        [
            anchors[:, 0] - anchors[:, 2] / 2, anchors[:, 1] - anchors[:, 3] / 2,
            anchors[:, 0] + anchors[:, 2] / 2, anchors[:, 1] + anchors[:, 3] / 2,
        ],
        axis=1,
    )
    gt = jnp.asarray(gt_cxcywh)
    gt_xyxy = jnp.asarray(
        [gt[0] - gt[2] / 2, gt[1] - gt[3] / 2, gt[0] + gt[2] / 2, gt[1] + gt[3] / 2]
    )[None]
    ious = box_ops.bbox_overlaps(anc_xyxy, gt_xyxy)[:, 0]

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    pos_cand = (ious > pos_iou_thr) & is_positive_pair
    neg_cand = (ious < neg_iou_thr) | (~is_positive_pair & (ious >= 0))
    # random subsets with quotas (16 pos, 64 total)
    pri_pos = jnp.where(pos_cand, jax.random.uniform(r1, ious.shape), 2.0)
    pos_rank = jnp.argsort(jnp.argsort(pri_pos))
    pos_sel = pos_cand & (pos_rank < num_pos)
    n_pos = jnp.sum(pos_sel)
    pri_neg = jnp.where(neg_cand, jax.random.uniform(r2, ious.shape), 2.0)
    neg_rank = jnp.argsort(jnp.argsort(pri_neg))
    neg_sel = neg_cand & (neg_rank < (num_total - n_pos))

    labels = pos_sel.astype(jnp.int32)
    weights = (pos_sel | neg_sel).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss_cls = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    targets = box_ops.bbox2delta(anc_xyxy, jnp.broadcast_to(gt_xyxy, anc_xyxy.shape))
    l1 = jnp.abs(deltas - targets).sum(-1)
    loss_bbox = jnp.sum(l1 * pos_sel) / jnp.maximum(n_pos, 1.0)
    total = loss_cls + 1.2 * loss_bbox
    return total, {"loss": total, "loss_rpn_cls": loss_cls, "loss_rpn_bbox": loss_bbox}


def make_siamrpn(cfg: SiamRPNConfig = SiamRPNConfig()):
    model = SiamRPN(cfg=cfg)
    # score map size: (255 - 127)/8 + 1 - 6 (head valid convs) = 11... computed
    # lazily by tracing instead:
    return model
