"""FlowNetSimple optical flow network (flax, NHWC).

Parity target: mmtracking/mmtrack/models/motion/flownet_simple.py:9-251 —
encoder convs (6->64->128->256->512->512->1024, LeakyReLU 0.1), decoder with
per-scale flow prediction + flow upsampling + deconv skip concat, image
renormalization to FlowNet's [0,1]-mean statistics, input down-scaling by
``img_scale_factor`` and final flow upscaling by ``4/img_scale_factor`` with
magnitude rescale and ``flow_scale_factor``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.preprocess import IMAGENET_MEAN, IMAGENET_STD

FLOW_IMG_MEAN = (0.411, 0.432, 0.450)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class FlowNetSimple(nn.Module):
    img_scale_factor: float = 0.5
    flow_scale_factor: float = 5.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_pair: jnp.ndarray) -> jnp.ndarray:
        """img_pair: [N, H, W, 6] — two ImageNet-normalized frames stacked on
        channels. Returns flow [N, H', W', 2] at input resolution/4 upscaled
        back per the reference (values in pixels at full image scale)."""
        x = img_pair.astype(self.dtype)
        # renormalize from detector stats to flownet stats
        mean = jnp.tile(jnp.asarray(IMAGENET_MEAN), 2)
        std = jnp.tile(jnp.asarray(IMAGENET_STD), 2)
        fmean = jnp.tile(jnp.asarray(FLOW_IMG_MEAN), 2)
        x = (x * std + mean) / 255.0 - fmean
        # downscale input
        n, h, w, c = x.shape
        sh = int(h * self.img_scale_factor)
        sw = int(w * self.img_scale_factor)
        x = jax.image.resize(x, (n, sh, sw, c), "bilinear")

        # encoder: (planes, kernel, extra 3x3 convs)
        enc = [
            (64, 7, 0), (128, 5, 0), (256, 5, 1), (512, 3, 1),
            (512, 3, 1), (1024, 3, 1),
        ]
        outs = []
        for i, (planes, k, extra) in enumerate(enc):
            x = _lrelu(nn.Conv(planes, (k, k), strides=(2, 2),
                               padding=[(k // 2, k // 2)] * 2,
                               dtype=self.dtype, name=f"conv{i + 1}")(x))
            for j in range(extra):
                kk = 3 if i == 2 else k
                x = _lrelu(nn.Conv(planes, (kk, kk), padding=[(kk // 2, kk // 2)] * 2,
                                   dtype=self.dtype, name=f"conv{i + 1}_{j + 1}")(x))
            if i + 1 in (2, 3, 4, 5, 6):  # out_indices
                outs.append(x)

        # decoder over out levels [conv2, conv3, conv4, conv5, conv6]
        deconv_planes = [512, 256, 128, 64]
        concat = outs[-1]
        for step, i in enumerate(range(len(outs) - 1, 0, -1)):
            flow = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                           dtype=self.dtype, name=f"predict_flow{i + 2}")(concat)
            upflow = nn.ConvTranspose(
                2, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"upsample_flow{i + 1}")(flow)
            deconv = _lrelu(nn.ConvTranspose(
                deconv_planes[step], (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, name=f"deconv{i + 1}")(concat))
            tgt = outs[i - 1]
            upflow = upflow[:, :tgt.shape[1], :tgt.shape[2]]
            deconv = deconv[:, :tgt.shape[1], :tgt.shape[2]]
            concat = jnp.concatenate([tgt, deconv, upflow], axis=-1)

        flow = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                       dtype=self.dtype, name="predict_flow")(concat)
        up = 4.0 / self.img_scale_factor
        n2, fh, fw, _ = flow.shape
        flow = jax.image.resize(flow, (n2, int(fh * up), int(fw * up), 2), "bilinear")
        return flow * up * self.flow_scale_factor


class EmbedAggregator(nn.Module):
    """FGFA cosine-similarity frame aggregator
    (mmtrack/models/aggregators/embed_aggregator.py:9-81)."""

    channels: int = 512
    num_convs: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, ref_x: jnp.ndarray) -> jnp.ndarray:
        """x: [1, H, W, C] key; ref_x: [N, H, W, C] (warped) refs incl. key.
        Returns [1, H, W, C] weighted sum."""
        p = self.kernel_size // 2
        convs = [
            nn.Conv(self.channels, (self.kernel_size,) * 2,
                    padding=[(p, p)] * 2, dtype=self.dtype,
                    name=f"embed_conv{i}")
            for i in range(self.num_convs)
        ]

        def embed(v):
            for i, conv in enumerate(convs):
                v = conv(v)
                if i != len(convs) - 1:
                    v = nn.relu(v)
            return v

        x_e = embed(x)
        ref_e = embed(ref_x)
        x_e = x_e / jnp.maximum(jnp.linalg.norm(x_e, axis=-1, keepdims=True), 1e-6)
        ref_e = ref_e / jnp.maximum(jnp.linalg.norm(ref_e, axis=-1, keepdims=True), 1e-6)
        w = jnp.sum(ref_e * x_e, axis=-1, keepdims=True)  # [N, H, W, 1]
        w = jax.nn.softmax(w, axis=0)
        return jnp.sum(ref_x * w, axis=0, keepdims=True)
