"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding (pjit over a Mesh) is exercised without TPU hardware, mirroring the
driver's ``dryrun_multichip`` environment.

Note: the session's sitecustomize may import jax at interpreter start with
JAX_PLATFORMS=axon (a remote TPU tunnel). Setting the env var here is too
late for that import, so we must ALSO update jax.config directly — otherwise
every test serializes through remote TPU compilation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: this host has ONE cpu core, so XLA compiles
# of the model-level test graphs dominate suite runtime (>10 min cold). With
# the cache warm (kept in /tmp, shared with bench.py and across pytest
# invocations) the full suite fits the CI budget.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
