import time, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from lowlightenvironmentvideoobjectdetection_tpu.registry import MODELS
from lowlightenvironmentvideoobjectdetection_tpu import zoo
from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa_darkfarm import (
    DarkfarmBatch, darkfarm_loss, init_darkfarm_params)
key = jax.random.PRNGKey(0)
model, anchors = MODELS.get("SelsaNewDarkfarmDetect")(out_indices=(0, 1, 2, 3, 3))
params = init_darkfarm_params(model, jax.random.PRNGKey(0))
batch = DarkfarmBatch(
    jax.random.normal(key, (3, 608, 1024, 6)),
    jnp.asarray([600.0, 1000.0]),
    jnp.asarray([[8.0, 8.0, 40.0, 40.0]] * 8),
    jnp.asarray([1] * 8, jnp.int32), jnp.asarray([True] * 8))
@jax.jit
def train_step(p, b, r):
    (l, m), g_ = jax.value_and_grad(
        lambda q: darkfarm_loss(model, q, b, r, anchors), has_aux=True)(p)
    return jax.tree.map(lambda a, gg: a - 1e-4 * gg, p, g_), l
t0 = time.perf_counter()
p = params
losses = []
for i in range(3):
    p, l = train_step(p, batch, jax.random.PRNGKey(1))
    losses.append(float(jax.device_get(l)))
print("l1234 losses:", [round(x, 3) for x in losses], f"({time.perf_counter()-t0:.0f}s)")
assert losses[-1] < losses[0]
print("OK")
