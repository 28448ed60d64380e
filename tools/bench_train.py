"""Training-step throughput bench (VERDICT r3 #5).

Measures compiled train-step steps/sec (and clip-frames/sec) on the current
backend for:
  (a) SELSA R50-DC5 (the north-star VID model), and
  (b) the flagship SelsaNewDarkfarmDetect (frozen cleaner + Denoising2
      aggregator + dual feature losses),
both at the reference's training resolution (1000x600 -> 608x1024 padded
bucket) with 1 key + 2 ref frames (imagenet_vid_fgfa_style train sampler).

Also reports the XLA cost-model FLOPs/step, the derived MFU against the
chip's peak, and the compiled peak HBM use. Timing uses the serial-chain
differential from bench.py (params feed the next step), which stays honest
over remote-TPU tunnels where block_until_ready under-reports.

Usage: python tools/bench_train.py [--steps 30] [--tiny] [--model both]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# v5e bf16 peak (per chip). Override with --peak-tflops for other chips.
DEFAULT_PEAK_TFLOPS = 197.0


def _rand_batch_common(rng, frames, h, w, chans):
    imgs = jnp.asarray(rng.uniform(-1, 1, (frames, h, w, chans)), jnp.float32)
    gt = np.zeros((8, 4), np.float32)
    gt[:, 0] = rng.uniform(0, w / 2, 8)
    gt[:, 1] = rng.uniform(0, h / 2, 8)
    gt[:, 2] = gt[:, 0] + rng.uniform(30, 200, 8)
    gt[:, 3] = gt[:, 1] + rng.uniform(30, 200, 8)
    return imgs, jnp.asarray(gt), jnp.asarray(rng.randint(0, 5, 8), jnp.int32)


def _make_selsa(tiny, packed=0, remat=True):
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
        SelsaConfig, SelsaDetector, TrainBatch, init_params, make_anchors,
        selsa_loss,
    )

    kw = dict(pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=16,
              num_roi_samples=16, compute_dtype=jnp.float32) if tiny else {}
    if packed:
        kw["input_packed"] = packed
    kw["remat"] = remat
    cfg = SelsaConfig(**kw)
    model = SelsaDetector(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), small=True)
    anchors = make_anchors(cfg)
    rng = np.random.RandomState(0)
    imgs, gt, gl = _rand_batch_common(rng, 3, cfg.pad_h, cfg.pad_w, 3)
    if packed:
        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
            pack_frame,
        )

        for _ in range(packed):
            imgs = pack_frame(imgs)
    batch = TrainBatch(
        imgs=imgs, img_shape=jnp.asarray([600.0, 1000.0] if not tiny
                                         else [64.0, 64.0]),
        gt_boxes=gt, gt_labels=gl, gt_valid=jnp.ones(8, bool))

    def loss_fn(variables, b, r):
        total, metrics = selsa_loss(model, variables, b, r, anchors)
        return total, metrics

    return params, batch, loss_fn


def _make_flagship(tiny, agg_taf=True, agg_rdb=True, with_aggregator=True,
                   remat=True, dcn_radius=3):
    import dataclasses

    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
        SelsaConfig, make_anchors,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa_darkfarm import (
        DarkfarmBatch, DarkfarmConfig, SelsaDarkfarmDetector, darkfarm_loss,
        init_darkfarm_params,
    )

    kw = dict(pad_h=64, pad_w=64, train_nms_pre=64, train_nms_post=16,
              num_roi_samples=16, compute_dtype=jnp.float32) if tiny else {}
    scfg = dataclasses.replace(
        SelsaConfig(**kw), num_classes=8, out_indices=(0, 1, 2, 3, 3),
        remat=remat)
    cfg = DarkfarmConfig(selsa=scfg, with_aggregator=with_aggregator,
                         agg_rdb=agg_rdb, agg_taf=agg_taf,
                         with_cleaner=True, loss_type="l1",
                         agg_dcn_radius=dcn_radius)
    model = SelsaDarkfarmDetector(cfg=cfg)
    params = init_darkfarm_params(model, jax.random.PRNGKey(0))
    anchors = make_anchors(scfg)
    rng = np.random.RandomState(1)
    imgs, gt, gl = _rand_batch_common(rng, 3, scfg.pad_h, scfg.pad_w, 6)
    batch = DarkfarmBatch(
        pair_imgs=imgs, img_shape=jnp.asarray([600.0, 1000.0] if not tiny
                                              else [64.0, 64.0]),
        gt_boxes=gt, gt_labels=gl, gt_valid=jnp.ones(8, bool))

    def loss_fn(variables, b, r):
        total, metrics = darkfarm_loss(model, variables, b, r, anchors)
        return total, metrics

    return params, batch, loss_fn


def _bench(name, params, batch, loss_fn, steps, peak_tflops):
    import optax

    from lowlightenvironmentvideoobjectdetection_tpu.parallel.train import (
        make_optimizer,
    )

    opt = make_optimizer(params, lr=0.01)
    opt_state = opt.init(params)

    def step(params, opt_state, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step, donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(2)

    lowered = step.lower(params, opt_state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    try:
        mem = compiled.memory_analysis()
        hbm_gb = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                  + mem.output_size_in_bytes) / 2**30
    except Exception:
        hbm_gb = float("nan")

    clone = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    def run(n):
        p, s = clone(params), clone(opt_state)
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            p, s, loss = step(p, s, batch, rng)
        float(jax.device_get(loss))
        return time.perf_counter() - t0

    run(2)  # warm
    short, long_ = max(2, steps // 10), steps
    diffs = sorted(run(long_) - run(short) for _ in range(3))
    sps = (long_ - short) / max(diffs[1], 1e-9)
    mfu = flops * sps / (peak_tflops * 1e12) if flops else float("nan")
    return {
        "model": name,
        "steps_per_sec": round(sps, 3),
        "clip_frames_per_sec": round(sps * 3, 2),
        "flops_per_step_G": round(flops / 1e9, 1),
        "mfu": round(mfu, 4),
        "hbm_gb": round(hbm_gb, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model", default="both",
                   choices=["both", "selsa", "flagship"])
    p.add_argument("--packed", type=int, default=0,
                   help="input_packed level for the SELSA train path (A/B)")
    p.add_argument("--peak-tflops", type=float, default=DEFAULT_PEAK_TFLOPS)
    # flagship hotspot A/B knobs
    p.add_argument("--no-taf", action="store_true")
    p.add_argument("--no-rdb", action="store_true")
    p.add_argument("--no-aggregator", action="store_true")
    p.add_argument("--dcn-radius", type=int, default=3,
                   help="windowed-DCN offset clamp for the flagship A/B")
    p.add_argument("--remat", default="true", choices=["true", "dots", "false"],
                   help="backbone remat policy for the A/B: full checkpoint, "
                        "dots-saveable, or no remat")
    args = p.parse_args()
    remat = {"true": True, "dots": "dots", "false": False}[args.remat]

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]), "remat": args.remat}
    if args.model in ("both", "selsa"):
        out["selsa"] = _bench("selsa_r50_dc5",
                              *_make_selsa(args.tiny, args.packed,
                                           remat=remat),
                              args.steps, args.peak_tflops)
        if args.packed:
            out["selsa"]["input_packed"] = args.packed
    if args.model in ("both", "flagship"):
        out["flagship"] = _bench(
            "selsa_new_darkfarm",
            *_make_flagship(args.tiny, agg_taf=not args.no_taf,
                            agg_rdb=not args.no_rdb,
                            with_aggregator=not args.no_aggregator,
                            remat=remat, dcn_radius=args.dcn_radius),
            args.steps, args.peak_tflops)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
