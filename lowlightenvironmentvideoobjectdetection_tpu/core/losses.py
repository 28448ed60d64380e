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
