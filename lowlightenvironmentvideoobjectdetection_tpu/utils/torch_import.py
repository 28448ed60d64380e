"""Import PyTorch checkpoints (torchvision ResNet / mmdet-mmtrack detectors)
into this framework's flax parameter trees.

Mirrors the reference's warm-start machinery (``load_checkpoint`` +
``pretrains=dict(detector=..., cleaner=...)``, mmtrack/models/vid/base.py:22-37
and tools/extract_checkpoints.py) so published reference weights can be used
for bit-parity evaluation.

Layout conversions:
- conv weights OIHW -> HWIO
- linear weights [out, in] -> [in, out]
- the FIRST fc after RoIAlign additionally permutes its input dim from the
  torch CHW flatten order to our HWC flatten order.
- BN -> FrozenBatchNorm params (scale/bias) + batch_stats (mean/var).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _fc(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _fc_chw_to_hwc(w, spatial: Tuple[int, int]) -> np.ndarray:
    """[out, C*H*W] (torch flatten) -> [H*W*C, out] (our flatten)."""
    out_dim, in_dim = w.shape
    h, wd = spatial
    c = in_dim // (h * wd)
    w4 = np.asarray(w).reshape(out_dim, c, h, wd)
    return np.transpose(w4, (2, 3, 1, 0)).reshape(h * wd * c, out_dim)


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def import_resnet(
    sd: Dict[str, "np.ndarray"],
    stage_blocks=(3, 4, 6, 3),
    prefix: str = "",
) -> Tuple[Dict, Dict]:
    """torchvision/mmdet ResNet state_dict -> (params, batch_stats) trees
    matching our ``ResNet`` module names (layer{i}_{j}, conv1..3/bn1..3)."""
    g = lambda k: np.asarray(sd[prefix + k])
    params: Dict = {"conv1": {"kernel": _conv(g("conv1.weight"))}}
    stats: Dict = {}
    p, s = _bn({k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}, "bn1")
    params["bn1"], stats["bn1"] = p, s

    for i, nblocks in enumerate(stage_blocks):
        for j in range(nblocks):
            t = f"layer{i + 1}.{j}."
            name = f"layer{i + 1}_{j}"
            bp: Dict = {}
            bs: Dict = {}
            for k in (1, 2, 3):
                if prefix + t + f"conv{k}.weight" not in sd:
                    continue  # BasicBlock has only conv1/2
                bp[f"conv{k}"] = {"kernel": _conv(g(t + f"conv{k}.weight"))}
                pp, ss = _bn(
                    {kk[len(prefix):]: v for kk, v in sd.items()
                     if kk.startswith(prefix)},
                    t + f"bn{k}",
                )
                bp[f"bn{k}"], bs[f"bn{k}"] = pp, ss
            if prefix + t + "downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(g(t + "downsample.0.weight"))
                }
                pp, ss = _bn(
                    {kk[len(prefix):]: v for kk, v in sd.items()
                     if kk.startswith(prefix)},
                    t + "downsample.1",
                )
                bp["downsample_bn"], bs["downsample_bn"] = pp, ss
            params[name], stats[name] = bp, bs
    return params, stats


def import_selsa_checkpoint(sd: Dict, num_shared_fcs: int = 2) -> Dict:
    """Full mmtrack SELSA checkpoint (detector.* keys) -> flax variables for
    ``SelsaDetector`` ({'params': ..., 'batch_stats': ...})."""
    d = {k[len("detector."):]: v for k, v in sd.items() if k.startswith("detector.")}
    if not d:
        d = dict(sd)

    bb_params, bb_stats = import_resnet(d, prefix="backbone.")

    neck_params = {
        "conv0": {
            "kernel": _conv(d["neck.convs.0.conv.weight"]),
            "bias": np.asarray(d["neck.convs.0.conv.bias"]),
        }
    }
    rpn_params = {
        "rpn_conv": {
            "kernel": _conv(d["rpn_head.rpn_conv.weight"]),
            "bias": np.asarray(d["rpn_head.rpn_conv.bias"]),
        },
        "rpn_cls": {
            "kernel": _conv(d["rpn_head.rpn_cls.weight"]),
            "bias": np.asarray(d["rpn_head.rpn_cls.bias"]),
        },
        "rpn_reg": {
            "kernel": _conv(d["rpn_head.rpn_reg.weight"]),
            "bias": np.asarray(d["rpn_head.rpn_reg.bias"]),
        },
    }

    bh = "roi_head.bbox_head."
    head_params: Dict = {}
    for i in range(num_shared_fcs):
        w = d[bh + f"shared_fcs.{i}.weight"]
        if i == 0:
            kernel = _fc_chw_to_hwc(w, (7, 7))
        else:
            kernel = _fc(w)
        head_params[f"shared_fc{i}"] = {
            "kernel": kernel,
            "bias": np.asarray(d[bh + f"shared_fcs.{i}.bias"]),
        }
        agg = bh.replace("bbox_head.", "bbox_head.") + f"aggregator.{i}."
        agg = f"roi_head.bbox_head.aggregator.{i}."
        if agg + "fc_embed.weight" in d:
            head_params[f"aggregator{i}"] = {
                name: {
                    "kernel": _fc(d[agg + t + ".weight"]),
                    "bias": np.asarray(d[agg + t + ".bias"]),
                }
                for name, t in (
                    ("fc_embed", "fc_embed"),
                    ("ref_fc_embed", "ref_fc_embed"),
                    ("fc", "fc"),
                    ("ref_fc", "ref_fc"),
                )
            }
    head_params["fc_cls"] = {
        "kernel": _fc(d[bh + "fc_cls.weight"]),
        "bias": np.asarray(d[bh + "fc_cls.bias"]),
    }
    head_params["fc_reg"] = {
        "kernel": _fc(d[bh + "fc_reg.weight"]),
        "bias": np.asarray(d[bh + "fc_reg.bias"]),
    }

    return {
        "params": {
            "backbone": bb_params,
            "neck": neck_params,
            "rpn_head": rpn_params,
            "bbox_head": head_params,
        },
        "batch_stats": {"backbone": bb_stats},
    }
