#!/usr/bin/env python
"""A/B benchmark of modulated-deform-conv (DCNv2) formulations at the
flagship TAF shapes (VERDICT r4 #3: the gather-based op pins flagship
training at 2.4% MFU).

Measures forward and forward+backward wall time on the real chip with the
serial-chain differential pattern (see bench.py — block_until_ready does
not reliably block over the tunnel).

Usage: python tools/bench_dcn.py [--h 152] [--w 252] [--c 128] [--steps 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def chain_time(fn, args, n_long=3, n_short=1, label=""):
    """Differential serial-chain timing: feed output back into input."""
    c_long = jax.jit(lambda *a: chain_args(fn, a, n_long))
    c_short = jax.jit(lambda *a: chain_args(fn, a, n_short))
    t0 = time.perf_counter()
    jax.block_until_ready(c_short(*args))
    print(f"  [{label}] short compiled+ran in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(c_long(*args))
    print(f"  [{label}] long compiled+ran in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(c_short(*args))[0])
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(c_long(*args))[0])
    t_long = time.perf_counter() - t0
    return (t_long - t_short) / (n_long - n_short)


def chain_args(fn, args, k):
    out = args
    for _ in range(k):
        out = fn(*out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=152)
    p.add_argument("--w", type=int, default=252)
    p.add_argument("--c", type=int, default=128)
    p.add_argument("--groups", type=int, default=8)
    p.add_argument("--skip-scan", action="store_true")
    p.add_argument("--skip-fused", action="store_true")
    p.add_argument("--skip-windowed", action="store_true")
    p.add_argument("--radius", type=int, default=3)
    args = p.parse_args()

    from lowlightenvironmentvideoobjectdetection_tpu.ops import deform_conv as DC

    h, w, c, g = args.h, args.w, args.c, args.groups
    k = 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    offset = jnp.asarray((rng.randn(h, w, g * 2 * k * k) * 1.0
                          ).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (h, w, g * k * k)
                                   ).astype(np.float32))
    weight = jnp.asarray(rng.randn(k, k, c, c).astype(np.float32) * 0.05)

    variants = {}
    if not args.skip_windowed:
        variants["windowed"] = lambda *a, **k: \
            DC.modulated_deform_conv_windowed(*a, radius=args.radius, **k)
    if not args.skip_fused:
        variants["fused_gather"] = DC.modulated_deform_conv_fused
    if not args.skip_scan:
        variants["scan_gather"] = DC.modulated_deform_conv

    for name, fn in variants.items():
        def fwd(x_, o_, m_):
            y = fn(x_, o_, m_, weight, deform_groups=g)
            return y[..., :c] * 0.001 + x_ * 0.999, o_, m_  # serial dep

        def fwdbwd(x_, o_, m_):
            def loss(xx, oo, mm):
                return jnp.sum(fn(xx, oo, mm, weight, deform_groups=g) ** 2)
            gx, go, gm = jax.grad(loss, argnums=(0, 1, 2))(x_, o_, m_)
            return x_ + gx * 1e-9, o_ + go * 1e-9, m_ + gm * 1e-9

        t_f = chain_time(fwd, (x, offset, mask), label=name + ":fwd")
        t_fb = chain_time(fwdbwd, (x, offset, mask), label=name + ":fwdbwd")
        print(f"{name}: fwd {t_f * 1e3:.2f} ms  fwd+bwd {t_fb * 1e3:.2f} ms "
              f"@ {h}x{w}x{c} g={g}")


if __name__ == "__main__":
    main()
