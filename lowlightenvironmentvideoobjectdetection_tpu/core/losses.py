"""Detection losses (pure JAX).

Parity targets in the reference:
- SmoothL1Loss: mmdetection/mmdet/models/losses/smooth_l1_loss.py
- CrossEntropyLoss (softmax + sigmoid/BCE variants):
  mmdetection/mmdet/models/losses/cross_entropy_loss.py
- sigmoid_focal_loss (mmcv CUDA): mmdet/models/losses/focal_loss.py
- L1/L2/MSE feature-consistency losses:
  mmtracking/mmtrack/models/vid/selsa_darkfarm_detect.py:171-187

All take explicit per-element ``weight`` and ``avg_factor`` so the masked
static-shape sampling integrates exactly like the reference's dynamic lists.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def smooth_l1_loss(pred, target, beta=1.0, weight=None, avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=None):
    return _reduce(jnp.abs(pred - target), weight, avg_factor)


def mse_loss(pred, target, weight=None, avg_factor=None):
    return _reduce(jnp.square(pred - target), weight, avg_factor)


def softmax_cross_entropy(
    logits, labels, weight=None, avg_factor=None, num_classes: Optional[int] = None
):
    """CE with integer labels; padded rows should carry weight 0."""
    nc = num_classes or logits.shape[-1]
    labels_safe = jnp.clip(labels, 0, nc - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    return _reduce(loss, weight, avg_factor)


def binary_cross_entropy(logits, labels, weight=None, avg_factor=None):
    """Sigmoid BCE with {0,1} (float) labels — RPN's use_sigmoid=True CE."""
    labels = labels.astype(logits.dtype)
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(loss, weight, avg_factor)


def sigmoid_focal_loss(
    logits, labels, gamma=2.0, alpha=0.25, weight=None, avg_factor=None
):
    """Per-class sigmoid focal loss; labels are one-hot (float) of the same
    shape as logits."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * labels + (1 - p) * (1 - labels)
    alpha_t = alpha * labels + (1 - alpha) * (1 - labels)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    return _reduce(loss, weight, avg_factor)


def accuracy(logits, labels, mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(correct)


def l2_loss_hard_mining(pred, target, weight=None, avg_factor=None,
                        sample_ratio: float = 3.0, margin: float = -1.0):
    """Weighted L2 with hard mining (reference: mmtrack
    models/losses/l2_loss.py:23 — used for ReID embedding matching).

    Keeps the hardest ``sample_ratio * num_pos`` negative elements by loss
    magnitude; elements below ``margin`` (when >= 0) are dropped.
    """
    import jax.numpy as _jnp

    err = (pred.astype(_jnp.float32) - target.astype(_jnp.float32)) ** 2
    if margin >= 0:
        err = _jnp.where(err > margin, err, 0.0)
    if weight is not None:
        pos = weight > 0
        num_pos = _jnp.maximum(_jnp.sum(pos), 1.0)
        n_keep = (sample_ratio * num_pos).astype(_jnp.int32)
        neg_err = _jnp.where(pos, -1.0, err)
        flat = _jnp.sort(neg_err.reshape(-1))[::-1]
        k = flat.shape[0]
        thr = flat[_jnp.clip(n_keep - 1, 0, k - 1)]
        keep = pos | ((err >= thr) & (n_keep > 0))
        err = err * keep
        return _reduce(err, None, avg_factor if avg_factor is not None
                       else _jnp.sum(keep))
    return _reduce(err, weight, avg_factor)


# ---------------------------------------------------------------------------
# IoU-family box losses (mmdet/models/losses/iou_loss.py)
# ---------------------------------------------------------------------------


def _box_iou_aligned(pred, target, eps=1e-6):
    """Element-aligned IoU of [N, 4] vs [N, 4] plus enclosing-box terms."""
    x1 = jnp.maximum(pred[:, 0], target[:, 0])
    y1 = jnp.maximum(pred[:, 1], target[:, 1])
    x2 = jnp.minimum(pred[:, 2], target[:, 2])
    y2 = jnp.minimum(pred[:, 3], target[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ap = jnp.clip(pred[:, 2] - pred[:, 0], 0) * jnp.clip(pred[:, 3] - pred[:, 1], 0)
    at = jnp.clip(target[:, 2] - target[:, 0], 0) * jnp.clip(target[:, 3] - target[:, 1], 0)
    union = ap + at - inter + eps
    iou = inter / union
    ex1 = jnp.minimum(pred[:, 0], target[:, 0])
    ey1 = jnp.minimum(pred[:, 1], target[:, 1])
    ex2 = jnp.maximum(pred[:, 2], target[:, 2])
    ey2 = jnp.maximum(pred[:, 3], target[:, 3])
    return iou, union, (ex1, ey1, ex2, ey2)


def iou_loss(pred, target, weight=None, avg_factor=None, eps=1e-6):
    """-log(IoU) (iou_loss.py:13)."""
    iou, _, _ = _box_iou_aligned(pred, target, eps)
    return _reduce(-jnp.log(jnp.clip(iou, eps)), weight, avg_factor)


def giou_loss(pred, target, weight=None, avg_factor=None, eps=1e-6):
    """1 - GIoU (iou_loss.py GIoULoss)."""
    iou, union, (ex1, ey1, ex2, ey2) = _box_iou_aligned(pred, target, eps)
    area_c = jnp.clip(ex2 - ex1, 0) * jnp.clip(ey2 - ey1, 0) + eps
    giou = iou - (area_c - union) / area_c
    return _reduce(1.0 - giou, weight, avg_factor)


def diou_loss(pred, target, weight=None, avg_factor=None, eps=1e-6):
    """1 - DIoU: IoU minus normalized center distance (iou_loss.py DIoULoss)."""
    iou, _, (ex1, ey1, ex2, ey2) = _box_iou_aligned(pred, target, eps)
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + eps
    pcx = (pred[:, 0] + pred[:, 2]) * 0.5
    pcy = (pred[:, 1] + pred[:, 3]) * 0.5
    tcx = (target[:, 0] + target[:, 2]) * 0.5
    tcy = (target[:, 1] + target[:, 3]) * 0.5
    rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
    return _reduce(1.0 - (iou - rho2 / c2), weight, avg_factor)


def ciou_loss(pred, target, weight=None, avg_factor=None, eps=1e-6):
    """1 - CIoU: DIoU plus aspect-ratio consistency (iou_loss.py CIoULoss)."""
    iou, _, (ex1, ey1, ex2, ey2) = _box_iou_aligned(pred, target, eps)
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + eps
    pcx = (pred[:, 0] + pred[:, 2]) * 0.5
    pcy = (pred[:, 1] + pred[:, 3]) * 0.5
    tcx = (target[:, 0] + target[:, 2]) * 0.5
    tcy = (target[:, 1] + target[:, 3]) * 0.5
    rho2 = (pcx - tcx) ** 2 + (pcy - tcy) ** 2
    pw = jnp.clip(pred[:, 2] - pred[:, 0], eps)
    ph = jnp.clip(pred[:, 3] - pred[:, 1], eps)
    tw = jnp.clip(target[:, 2] - target[:, 0], eps)
    th = jnp.clip(target[:, 3] - target[:, 1], eps)
    v = (4 / jnp.pi ** 2) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.clip(1.0 - iou + v, eps))
    return _reduce(1.0 - (iou - rho2 / c2 - alpha * v), weight, avg_factor)


def bounded_iou_loss(pred, target, weight=None, avg_factor=None,
                     beta=0.2, eps=1e-3):
    """BoundedIoULoss (iou_loss.py:76): smooth-l1 on per-axis bounded IoU
    deficits of center offsets and sizes."""
    pcx = (pred[:, 0] + pred[:, 2]) * 0.5
    pcy = (pred[:, 1] + pred[:, 3]) * 0.5
    pw = pred[:, 2] - pred[:, 0] + eps
    ph = pred[:, 3] - pred[:, 1] + eps
    tcx = jax.lax.stop_gradient((target[:, 0] + target[:, 2]) * 0.5)
    tcy = jax.lax.stop_gradient((target[:, 1] + target[:, 3]) * 0.5)
    tw = jax.lax.stop_gradient(target[:, 2] - target[:, 0]) + eps
    th = jax.lax.stop_gradient(target[:, 3] - target[:, 1]) + eps
    dx = tcx - pcx
    dy = tcy - pcy
    loss_comps = jnp.stack([
        1.0 - jnp.maximum((tw - 2.0 * jnp.abs(dx)) / (tw + 2.0 * jnp.abs(dx)), 0),
        1.0 - jnp.maximum((th - 2.0 * jnp.abs(dy)) / (th + 2.0 * jnp.abs(dy)), 0),
        1.0 - jnp.minimum(tw / pw, pw / tw),
        1.0 - jnp.minimum(th / ph, ph / th),
    ], axis=-1)
    loss = jnp.where(loss_comps < beta,
                     0.5 * loss_comps ** 2 / beta,
                     loss_comps - 0.5 * beta).sum(-1)
    return _reduce(loss, weight, avg_factor)


# ---------------------------------------------------------------------------
# Balanced L1 (Libra R-CNN, mmdet/models/losses/balanced_l1_loss.py)
# ---------------------------------------------------------------------------


def balanced_l1_loss(pred, target, weight=None, avg_factor=None,
                     beta=1.0, alpha=0.5, gamma=1.5):
    diff = jnp.abs(pred - target)
    b = jnp.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta,
    )
    return _reduce(loss, weight, avg_factor)


# ---------------------------------------------------------------------------
# GHM (gradient harmonizing mechanism, mmdet/models/losses/ghm_loss.py)
# ---------------------------------------------------------------------------


def ghm_c_loss(logits, labels, valid=None, bins=10, momentum=0.0,
               avg_factor=None):
    """GHM-C classification loss (GHMC): BCE re-weighted by the inverse
    gradient-norm density. labels: {0,1} float; valid: bool mask."""
    labels = labels.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones(labels.shape, bool)
    g = jnp.abs(jax.nn.sigmoid(logits) - labels)
    edges = jnp.linspace(0.0, 1.0, bins + 1).at[-1].add(1e-6)
    tot = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    weights = jnp.zeros_like(g)
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().astype(jnp.float32)
        w = jnp.where(num_in_bin > 0, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = jnp.where(inds, w, weights)
    n_nonempty = 0
    # normalize by the number of non-empty bins (reference divides by n)
    nonempty = jnp.stack([
        (((g >= edges[i]) & (g < edges[i + 1]) & valid).sum() > 0)
        for i in range(bins)
    ]).sum().astype(jnp.float32)
    del n_nonempty
    weights = weights / jnp.maximum(nonempty, 1.0)
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce * weights
    af = tot if avg_factor is None else avg_factor
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(af, 1.0)


def ghm_r_loss(pred, target, valid=None, mu=0.02, bins=10, avg_factor=None):
    """GHM-R regression loss (GHMR): ASL1 re-weighted by gradient density."""
    diff = pred - target
    asl1 = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(diff / jnp.sqrt(diff * diff + mu * mu))
    if valid is None:
        valid = jnp.ones(pred.shape, bool)
    edges = jnp.linspace(0.0, 1.0, bins + 1).at[-1].add(1e3)
    tot = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    weights = jnp.zeros_like(g)
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().astype(jnp.float32)
        w = jnp.where(num_in_bin > 0, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = jnp.where(inds, w, weights)
    nonempty = jnp.stack([
        (((g >= edges[i]) & (g < edges[i + 1]) & valid).sum() > 0)
        for i in range(bins)
    ]).sum().astype(jnp.float32)
    weights = weights / jnp.maximum(nonempty, 1.0)
    af = tot if avg_factor is None else avg_factor
    return jnp.sum(jnp.where(valid, asl1 * weights, 0.0)) / jnp.maximum(af, 1.0)


# ---------------------------------------------------------------------------
# Gaussian focal + associative embedding (CornerNet,
# mmdet/models/losses/gaussian_focal_loss.py, ae_loss.py)
# ---------------------------------------------------------------------------


def gaussian_focal_loss(pred, gaussian_target, weight=None, avg_factor=None,
                        alpha=2.0, gamma=4.0, eps=1e-12):
    """Focal loss on Gaussian-smoothed heatmap targets."""
    pos_w = (gaussian_target == 1).astype(jnp.float32)
    neg_w = jnp.power(1 - gaussian_target, gamma)
    pos = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * pos_w
    neg = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * neg_w * (1 - pos_w)
    return _reduce(pos + neg, weight, avg_factor)


def ae_loss(tl_embed, br_embed, match_valid, pull_weight=0.25,
            push_weight=0.25):
    """Associative-embedding pull/push loss over matched corner pairs.

    tl_embed/br_embed: [K] embeddings of matched top-left / bottom-right
    corners; match_valid: [K] bool. (ae_loss.py single-scalar-embedding
    form.)"""
    v = match_valid.astype(jnp.float32)
    n = jnp.maximum(v.sum(), 1.0)
    mean = (tl_embed + br_embed) * 0.5
    pull = (((tl_embed - mean) ** 2 + (br_embed - mean) ** 2) * v).sum() / n
    dist = jnp.abs(mean[:, None] - mean[None, :])
    margin = jnp.maximum(1.0 - dist, 0.0)
    pair_v = v[:, None] * v[None, :] * (1.0 - jnp.eye(v.shape[0]))
    n_pairs = jnp.maximum(pair_v.sum(), 1.0)
    push = (margin * pair_v).sum() / n_pairs
    return pull_weight * pull + push_weight * push
