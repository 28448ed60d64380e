#!/usr/bin/env python
"""Model export CLI — the TPU-native analog of the reference's
pytorch2onnx (mmdet/core/export/pytorch2onnx.py): serializes the compiled
inference function as portable StableHLO via ``jax.export``.

Usage:
  python tools/export.py configs/vid/selsa/selsa_faster_rcnn_r50_dc5_1x_imagenetvid.py \
      --out /tmp/selsa.stablehlo --tiny
"""
import argparse, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--out", required=True)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from lowlightenvironmentvideoobjectdetection_tpu.apis.inference import init_model
    from lowlightenvironmentvideoobjectdetection_tpu.config import Config
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid import selsa as S

    # NamedTuple pytrees need registered serializers for export
    from lowlightenvironmentvideoobjectdetection_tpu.core.nms import DetResult
    for nt in (S.VideoState, DetResult):
        try:
            jexport.register_namedtuple_serialization(
                nt, serialized_name=nt.__name__)
        except ValueError:
            pass  # already registered

    cfg = Config.fromfile(args.config)
    mcfg = dict(cfg["model"]); mtype = mcfg.pop("type")
    if mtype not in ("SELSA", "FGFA", "DFF", "FasterRCNN"):
        mcfg.setdefault("out_indices", (3,))
        mcfg.pop("loss_type", None); mcfg.pop("in_channels", None)
        mtype = "SELSA"
    if args.tiny:
        mcfg.update(pad_h=64, pad_w=64, test_nms_pre=64, test_nms_post=16,
                    compute_dtype=jnp.float32)
    model = init_model(model_type=mtype, checkpoint=args.checkpoint, **mcfg)
    c = model.cfg

    state = S.empty_video_state(c)
    frame = jnp.zeros((c.pad_h, c.pad_w, 3), jnp.float32)
    img_shape = jnp.asarray([float(c.pad_h), float(c.pad_w)])
    sf = jnp.ones((4,))

    fn = jax.jit(lambda params, st, fr: S.inference_step(
        model.model, params, st, fr, img_shape, sf, model.anchors))
    exported = jexport.export(fn)(model.params, state, frame)
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"exported {len(data)/1e6:.1f} MB StableHLO to {args.out}")
    # round-trip check
    back = jexport.deserialize(data)
    print("round-trip OK:", back.in_avals is not None)


if __name__ == "__main__":
    main()
