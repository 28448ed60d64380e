import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Micro A/B: reshape->[300,25088] matmul vs direct dot_general from the
chunked RoIAlign output [5,60,7,7,512] (relayout fused into the matmul)."""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

x = jax.random.normal(jax.random.PRNGKey(0), (5, 60, 7, 7, 512), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (25088, 1024), jnp.bfloat16) * 0.01
b = jax.random.normal(jax.random.PRNGKey(2), (1024,), jnp.float32)


def f_reshape(x, w, b):
    y = x.reshape(300, 25088) @ w + b.astype(jnp.bfloat16)
    return y


def f_dotgen(x, w, b):
    w4 = w.reshape(7, 7, 512, 1024)
    y = lax.dot_general(
        x.reshape(300, 7, 7, 512), w4,
        (((1, 2, 3), (0, 1, 2)), ((), ())))
    return y + b.astype(jnp.bfloat16)


r0 = jax.jit(f_reshape)(x, w, b)
r1 = jax.jit(f_dotgen)(x, w, b)
print("maxdiff:", float(jnp.abs(r0.astype(jnp.float32) - r1.astype(jnp.float32)).max()))


def bench(fn, tag, iters=600):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def body(i, x):
            return x + 1e-12 * fn(x, w, b).sum().astype(x.dtype)
        return lax.fori_loop(0, n, body, x)

    jax.device_get(chain(x, 2).reshape(-1)[0])
    jax.device_get(chain(x, iters).reshape(-1)[0])

    def run(n):
        t0 = time.perf_counter()
        jax.device_get(chain(x, n).reshape(-1)[0])
        return time.perf_counter() - t0

    ds = sorted(run(iters) - run(60) for _ in range(3))
    print(f"{tag}: {ds[1] / (iters - 60) * 1e6:.1f} us", flush=True)


bench(f_reshape, "reshape + matmul (current)")
bench(f_dotgen, "direct dot_general from 5D")
