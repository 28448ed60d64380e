"""SelsaFastDVDnetDetect — image-space-denoise-then-detect baseline.

Parity target: mmtracking/mmtrack/models/vid/selsa_fastdvd_darkfarm.py:
- builds an edge-replicated 5-frame 15-channel window around every frame
  (L162-171, L301-308), runs the FastDVDnet cleaner to get denoised frames,
- then runs standard SELSA RPN + RoI training / streaming inference on the
  denoised frames instead of the raw noisy ones.

TPU design: the per-frame window loop becomes a ``lax.map`` over frame
indices (`cleaners.video_denoisers.fastdvd_denoise_clip`), and the detection
path is exactly the shared SELSA system — the denoiser composes in front of
``extract_feat`` inside the same compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses as L
from ..cleaners.video_denoisers import FastDVDnet, fastdvd_denoise_clip
from .selsa import (
    SelsaConfig,
    SelsaDetector,
    TrainBatch,
    make_anchors,
    selsa_loss,
)


@dataclasses.dataclass(frozen=True)
class FastDVDSelsaConfig:
    selsa: SelsaConfig = SelsaConfig(num_classes=8)
    # weight of the optional image-space fidelity loss vs the clean frames
    # (0 trains detection only with a frozen/pretrained denoiser)
    denoise_loss_weight: float = 1.0
    in_channels: int = 3
    # 'fastdvd' (5-frame video denoiser) or 'unet' (per-frame image
    # denoiser baseline — reference llvod_unet_darkfarm.py)
    denoiser: str = "fastdvd"


class FastDVDSelsaDetector(nn.Module):
    """FastDVDnet denoiser composed in front of a SELSA detector."""

    cfg: FastDVDSelsaConfig = FastDVDSelsaConfig()

    def setup(self):
        if self.cfg.denoiser == "unet":
            from ..cleaners.video_denoisers import Unet

            self.denoiser = Unet(name="denoiser")
        else:
            self.denoiser = FastDVDnet(name="denoiser")
        self.selsa = SelsaDetector(cfg=self.cfg.selsa, name="selsa")

    def denoise_clip(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames: [T, H, W, 3] -> denoised [T, H, W, 3] via sliding 5-frame
        edge-replicated windows (selsa_fastdvd_darkfarm.py:162-171)."""
        t = frames.shape[0]
        # static python loop (flax params can't be created under lax.map);
        # the denoiser weights are shared so XLA caches one compiled block
        if self.cfg.denoiser == "unet":  # per-frame image denoiser
            return jnp.stack([self.denoiser(frames[i]) for i in range(t)])
        outs = []
        for i in range(t):
            win_idx = [min(max(i + d, 0), t - 1) for d in range(-2, 3)]
            stacked = jnp.concatenate([frames[j] for j in win_idx], axis=-1)
            outs.append(self.denoiser(stacked))
        return jnp.stack(outs)

    def __call__(self, pair_imgs: jnp.ndarray):
        """Init path. pair_imgs: [T, H, W, 2C] noise||clean pairs."""
        c = self.cfg.in_channels
        den = self.denoise_clip(pair_imgs[..., :c])
        return self.selsa(den)


class FastDVDBatch(NamedTuple):
    pair_imgs: jnp.ndarray  # [1+R, H, W, 2C]; index 0 = key
    img_shape: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_labels: jnp.ndarray
    gt_valid: jnp.ndarray


def fastdvd_selsa_loss(model: FastDVDSelsaDetector, params,
                       batch: FastDVDBatch, rng: jax.Array,
                       anchors: jnp.ndarray):
    """Denoise → SELSA detection loss (+ optional L2 fidelity to clean)."""
    cfg = model.cfg
    c = cfg.in_channels
    noise, clean = batch.pair_imgs[..., :c], batch.pair_imgs[..., c:]
    den = model.apply(params, noise, method=FastDVDSelsaDetector.denoise_clip)

    # reuse the whole SELSA loss on the denoised frames through the nested
    # module: re-root every collection (params, batch_stats) at `selsa`
    sub_params = {col: tree["selsa"] for col, tree in params.items()
                  if "selsa" in tree}
    det_batch = TrainBatch(den, batch.img_shape, batch.gt_boxes,
                           batch.gt_labels, batch.gt_valid)
    total, metrics = selsa_loss(
        SelsaDetector(cfg=cfg.selsa), sub_params, det_batch, rng, anchors
    )
    if cfg.denoise_loss_weight > 0:
        dn = L.mse_loss(den, clean) * cfg.denoise_loss_weight
        metrics["loss_denoise"] = dn
        total = total + dn
        metrics["loss"] = total
    return total, metrics


def make_fastdvd_selsa(cfg: Optional[FastDVDSelsaConfig] = None):
    cfg = cfg or FastDVDSelsaConfig()
    model = FastDVDSelsaDetector(cfg=cfg)
    anchors = make_anchors(cfg.selsa)
    return model, anchors
