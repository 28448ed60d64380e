#!/usr/bin/env python
"""Export a compiled inference function to a serialized StableHLO artifact.

Parity target: mmdetection/mmdet/core/export/pytorch2onnx.py + the
``torch.onnx.is_in_onnx_export()`` guards in the reference model code — the
deployment-export path. The TPU-native analog is ``jax.export``: the jitted
detect / streaming-step function is traced once at fixed shapes, serialized
as portable StableHLO bytes, and can be reloaded and called from any future
jax (or via the C++ XLA runtime) without the Python model code.

Modes:
  detector  — a family's single-image detect fn     (inference_detector)
  stream    — the SELSA streaming step               (inference_vid)

Writes <out>.stablehlo plus a json sidecar with shapes/dtypes, then
round-trips: deserialize + run on dummy inputs and compare with the live
function (unless --no-verify).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--mode", choices=["detector", "stream"],
                   default="detector")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--no-verify", action="store_true")
    args = p.parse_args()

    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from lowlightenvironmentvideoobjectdetection_tpu.config import Config

    cfg = Config.fromfile(args.config)
    mcfg = dict(cfg["model"])
    mtype = mcfg.pop("type")

    if args.mode == "detector":
        from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import (
            DetectorModel,
        )

        det = DetectorModel(model_type=mtype, tiny=args.tiny, **mcfg)
        if args.checkpoint:
            from lowlightenvironmentvideoobjectdetection_tpu.utils.checkpoint import (
                load_checkpoint,
            )

            det.params = load_checkpoint(args.checkpoint)
        h, w = det.pad_h, det.pad_w
        img = jnp.zeros((h, w, 3), jnp.float32)
        shape = jnp.asarray([float(h), float(w)])
        sf = jnp.ones((4,), jnp.float32)

        fam, model, aux, params = det.family, det.model, det.aux, det.params

        def fn(params, img, shape, sf):
            return fam.detect(model, aux, params, img, shape, sf)

        exp = jexport.export(jax.jit(fn))(params, img, shape, sf)
        sample = (params, img, shape, sf)
    else:
        from lowlightenvironmentvideoobjectdetection_tpu.models.vid import (
            selsa as S,
        )

        kw = dict(mcfg)
        if args.tiny:
            kw.update(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                      num_roi_samples=16, compute_dtype=jnp.float32)
        scfg = S.SelsaConfig(**{k: v for k, v in kw.items()
                                if k in S.SelsaConfig.__dataclass_fields__})
        model = S.SelsaDetector(cfg=scfg)
        params = S.init_params(model, jax.random.PRNGKey(0), small=True)
        anchors = S.make_anchors(scfg)
        refs = jnp.zeros((scfg.num_ref_frames, scfg.pad_h, scfg.pad_w, 3))
        state = S.init_video_state(model, params, refs,
                                   (float(scfg.pad_h), float(scfg.pad_w)),
                                   anchors)
        frame = jnp.zeros((scfg.pad_h, scfg.pad_w, 3))
        shape = jnp.asarray([float(scfg.pad_h), float(scfg.pad_w)])
        sf = jnp.ones((4,), jnp.float32)

        def fn(params, anchors, state, frame, shape, sf):
            return S.inference_step(model, params, state, frame, shape, sf,
                                    anchors)

        exp = jexport.export(jax.jit(fn))(params, anchors, state, frame,
                                          shape, sf)
        sample = (params, anchors, state, frame, shape, sf)

    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = dict(
        mode=args.mode, model=mtype, config=args.config,
        platforms=list(exp.platforms),
        nbytes=len(blob),
        in_avals=[str(a) for a in exp.in_avals],
        out_avals=[str(a) for a in exp.out_avals],
    )
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)

    verified = None
    if not args.no_verify:
        rt = jexport.deserialize(blob)
        got = rt.call(*sample)
        want = fn(*sample)
        flat_g = jax.tree_util.tree_leaves(got)
        flat_w = jax.tree_util.tree_leaves(want)
        for g, wv in zip(flat_g, flat_w):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(wv, np.float32),
                                       rtol=1e-4, atol=1e-4)
        verified = True
    print(json.dumps(dict(out=args.out, verified=verified, **meta)))


if __name__ == "__main__":
    main()
