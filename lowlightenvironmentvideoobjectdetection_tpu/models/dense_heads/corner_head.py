"""CornerNet + CentripetalNet: keypoint-based detection.

Parity targets:
- CornerHead (mmdetection/mmdet/models/dense_heads/corner_head.py:1-1074):
  Hourglass features → top-left / bottom-right branches with corner pooling
  (ops/corner_pool.py) → per-corner class HEATMAPS (gaussian-penalty focal),
  1-D associative EMBEDDINGS (pull/push loss) and sub-pixel OFFSETS (L1);
  decode: top-k corners per branch, pair tl/br of the same class by
  embedding distance, box = (tl, br).
- CentripetalHead (centripetal_head.py:1-421): embeddings replaced by
  CENTRIPETAL SHIFTS (vector from the corner to the box center; matching by
  shift-predicted center agreement) plus a guiding-shift branch that feeds
  a DeformConv feature adaption; losses: focal + L1(shift) x2.

TPU-native: gaussian targets are drawn as dense [H, W] radial maps per gt
(max-combined); corner pairing is a [K, K] score matrix instead of loops.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.corner_pool import br_pool, tl_pool
from ..backbones.hourglass import HourglassNet


class CornerBranch(nn.Module):
    """Corner-pooled conv branch: heatmap + embedding/shift + offset."""

    num_classes: int = 80
    emb_dim: int = 1  # 1 for CornerNet embedding; 2 for centripetal shift
    pool: str = "tl"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        ch = x.shape[-1]
        p = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="pool_conv")(x)
        p = tl_pool(p) if self.pool == "tl" else br_pool(p)
        p = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="fuse_conv")(p) + x)
        heat = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       bias_init=nn.initializers.constant(-2.19),
                       name="heat_out")(nn.relu(nn.Conv(
                           ch, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype, name="heat_conv")(p)))
        emb = nn.Conv(self.emb_dim, (1, 1), dtype=self.dtype,
                      name="emb_out")(nn.relu(nn.Conv(
                          ch, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name="emb_conv")(p)))
        off = nn.Conv(2, (1, 1), dtype=self.dtype, name="off_out")(
            nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name="off_conv")(p)))
        return (heat.astype(jnp.float32), emb.astype(jnp.float32),
                off.astype(jnp.float32))


class CornerNet(nn.Module):
    """HourglassNet-(small) + tl/br corner branches on the last stack."""

    num_classes: int = 80
    emb_dim: int = 1
    stacks: int = 2
    hg_depth: int = 3
    hg_channels: Tuple[int, ...] = (64, 64, 96, 96)
    feat_channel: int = 64
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = HourglassNet(
            num_stacks=self.stacks, depth=self.hg_depth,
            channels=self.hg_channels, feat_channel=self.feat_channel,
            dtype=self.dtype, name="backbone")
        self.tl_branch = CornerBranch(num_classes=self.num_classes,
                                      emb_dim=self.emb_dim, pool="tl",
                                      dtype=self.dtype, name="tl_branch")
        self.br_branch = CornerBranch(num_classes=self.num_classes,
                                      emb_dim=self.emb_dim, pool="br",
                                      dtype=self.dtype, name="br_branch")

    def __call__(self, imgs):
        feat = self.backbone(imgs)[-1]
        return self.tl_branch(feat), self.br_branch(feat)


def gaussian_targets(points, radii, valid, h: int, w: int, labels,
                     num_classes: int):
    """Dense per-class gaussian heatmap targets [H, W, C], max-combined
    (corner_head.py get_targets / gen_gaussian_target)."""
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def one(pt, r, v, lab):
        d2 = (xs - pt[0]) ** 2 + (ys - pt[1]) ** 2
        g = jnp.exp(-d2 / jnp.maximum(2 * (r / 3) ** 2, 1e-6)) * v
        return g[:, :, None] * jax.nn.one_hot(lab, num_classes)[None, None]

    maps = jax.vmap(one)(points, radii, valid.astype(jnp.float32),
                         jnp.clip(labels, 0, num_classes - 1))
    return jnp.max(maps, axis=0)


def corner_focal(heat_logits, gauss_tgt):
    """Penalty-reduced pixel-wise focal (CornerNet eq. 1)."""
    p = jax.nn.sigmoid(heat_logits)
    pos = gauss_tgt > 0.99
    pos_loss = -((1 - p) ** 2) * jnp.log(jnp.clip(p, 1e-8)) * pos
    neg_loss = (-((1 - gauss_tgt) ** 4) * (p ** 2)
                * jnp.log(jnp.clip(1 - p, 1e-8)) * ~pos)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos


class CornerLossOut(NamedTuple):
    loss_heat: jnp.ndarray
    loss_emb: jnp.ndarray
    loss_off: jnp.ndarray


def corner_loss(tl_out, br_out, gt_boxes, gt_labels, gt_valid, img_shape,
                num_classes, stride: int = 4,
                centripetal: bool = False) -> CornerLossOut:
    heat_tl, emb_tl, off_tl = tl_out
    heat_br, emb_br, off_br = br_out
    h, w = heat_tl.shape[-3], heat_tl.shape[-2]
    g = gt_boxes / stride
    tl_pts = jnp.stack([g[:, 0], g[:, 1]], axis=-1)
    br_pts = jnp.stack([g[:, 2], g[:, 3]], axis=-1)
    gw = jnp.maximum(g[:, 2] - g[:, 0], 1.0)
    gh = jnp.maximum(g[:, 3] - g[:, 1], 1.0)
    radii = jnp.maximum(jnp.minimum(gw, gh) / 3.0, 1.0)

    tl_tgt = gaussian_targets(tl_pts, radii, gt_valid, h, w, gt_labels,
                              num_classes)
    br_tgt = gaussian_targets(br_pts, radii, gt_valid, h, w, gt_labels,
                              num_classes)
    loss_heat = (corner_focal(heat_tl.reshape(h, w, -1), tl_tgt)
                 + corner_focal(heat_br.reshape(h, w, -1), br_tgt))

    # per-gt corner cell indices (clipped)
    tl_ix = jnp.clip(jnp.floor(tl_pts), 0, jnp.asarray([w - 1, h - 1]))
    br_ix = jnp.clip(jnp.floor(br_pts), 0, jnp.asarray([w - 1, h - 1]))
    num_pos = jnp.maximum(jnp.sum(gt_valid), 1.0)
    vf = gt_valid.astype(jnp.float32)

    def gather(m, ix):
        flat = m.reshape(h * w, -1)
        lin = (ix[:, 1] * w + ix[:, 0]).astype(jnp.int32)
        return flat[lin]

    # offsets: fractional part of the corner position
    off_t_tgt = tl_pts - jnp.floor(tl_pts)
    off_b_tgt = br_pts - jnp.floor(br_pts)
    loss_off = (jnp.sum(jnp.abs(gather(off_tl.reshape(h, w, 2), tl_ix)
                                - off_t_tgt) * vf[:, None])
                + jnp.sum(jnp.abs(gather(off_br.reshape(h, w, 2), br_ix)
                                  - off_b_tgt) * vf[:, None])) / num_pos

    if centripetal:
        # centripetal shift targets: log-scaled vector corner -> center
        ctr = jnp.stack([(g[:, 0] + g[:, 2]) / 2,
                         (g[:, 1] + g[:, 3]) / 2], axis=-1)
        sh_t = jnp.log(jnp.maximum(ctr - tl_pts, 1e-4))
        sh_b = jnp.log(jnp.maximum(br_pts - ctr, 1e-4))
        loss_emb = (jnp.sum(jnp.abs(gather(emb_tl.reshape(h, w, 2), tl_ix)
                                    - sh_t) * vf[:, None])
                    + jnp.sum(jnp.abs(gather(emb_br.reshape(h, w, 2), br_ix)
                                      - sh_b) * vf[:, None])) / num_pos
    else:
        # associative embedding pull/push (corner_head.py loss_embedding)
        e_t = gather(emb_tl.reshape(h, w, 1), tl_ix)[:, 0]
        e_b = gather(emb_br.reshape(h, w, 1), br_ix)[:, 0]
        mean = (e_t + e_b) / 2
        pull = jnp.sum(((e_t - mean) ** 2 + (e_b - mean) ** 2) * vf) / num_pos
        dist = jnp.abs(mean[:, None] - mean[None, :])
        pair_v = vf[:, None] * vf[None, :] * (
            1 - jnp.eye(mean.shape[0]))
        push = jnp.sum(jnp.maximum(1.0 - dist, 0.0) * pair_v) / jnp.maximum(
            jnp.sum(pair_v), 1.0)
        loss_emb = pull + push
    return CornerLossOut(loss_heat, loss_emb, loss_off)


def corner_decode(tl_out, br_out, num_classes, k: int = 20,
                  stride: int = 4, emb_thr: float = 1.0,
                  max_per_img: int = 20, centripetal: bool = False):
    """Pair top-k tl/br corners (corner_head.py decode_heatmap).

    Returns (boxes [M, 4], scores [M], labels [M], valid [M])."""
    heat_tl, emb_tl, off_tl = tl_out
    heat_br, emb_br, off_br = br_out
    h, w = heat_tl.shape[-3], heat_tl.shape[-2]

    def topk(heat, emb, off):
        p = jax.nn.sigmoid(heat.reshape(h * w, num_classes))
        flat = p.reshape(-1)
        s, i = jax.lax.top_k(flat, k)
        cell = i // num_classes
        lab = (i % num_classes).astype(jnp.int32)
        y = (cell // w).astype(jnp.float32)
        x = (cell % w).astype(jnp.float32)
        o = off.reshape(h * w, 2)[cell]
        e = emb.reshape(h * w, -1)[cell]
        return s, lab, x + o[:, 0], y + o[:, 1], e

    s_t, l_t, x_t, y_t, e_t = topk(heat_tl, emb_tl, off_tl)
    s_b, l_b, x_b, y_b, e_b = topk(heat_br, emb_br, off_br)

    score = (s_t[:, None] + s_b[None, :]) / 2
    same = l_t[:, None] == l_b[None, :]
    geom = (x_b[None, :] >= x_t[:, None]) & (y_b[None, :] >= y_t[:, None])
    if centripetal:
        ctr_t = jnp.stack([x_t, y_t], -1) + jnp.exp(e_t)
        ctr_b = jnp.stack([x_b, y_b], -1) - jnp.exp(e_b)
        d = jnp.linalg.norm(ctr_t[:, None] - ctr_b[None, :], axis=-1)
        diag = jnp.maximum(jnp.linalg.norm(jnp.stack(
            [x_b[None, :] - x_t[:, None], y_b[None, :] - y_t[:, None]],
            -1), axis=-1), 1.0)
        match = d / diag < 0.5
    else:
        match = jnp.abs(e_t[:, None, 0] - e_b[None, :, 0]) < emb_thr
    ok = same & geom & match
    score = jnp.where(ok, score, -1.0)

    flat = score.reshape(-1)
    m = min(max_per_img, flat.shape[0])
    top_s, top_i = jax.lax.top_k(flat, m)
    ti = top_i // k
    bi = top_i % k
    boxes = jnp.stack([x_t[ti], y_t[ti], x_b[bi], y_b[bi]], -1) * stride
    return boxes, top_s, l_t[ti], top_s > 0


class CentripetalNet(CornerNet):
    """CornerNet with 2-D centripetal shifts instead of embeddings
    (centripetal_head.py)."""

    emb_dim: int = 2
