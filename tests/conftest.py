"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Env vars must be set before JAX is imported anywhere, so this conftest sets
them at import time (pytest imports conftest.py before any test module).
Multi-chip sharding code (shard_map / pjit over a Mesh) is exercised against
the 8 virtual CPU devices; real-TPU behavior is covered by bench.py and the
driver's dryrun.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test numerics deterministic and float32-strict.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
