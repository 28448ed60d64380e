"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding (pjit over a Mesh) is exercised without TPU hardware, mirroring the
driver's ``dryrun_multichip`` environment."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
