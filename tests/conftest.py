"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Env vars must be set before JAX is imported anywhere, so this conftest sets
them at import time (pytest imports conftest.py before any test module).
Multi-chip sharding code (shard_map / pjit over a Mesh) is exercised against
the 8 virtual CPU devices; real-TPU behavior is covered by bench.py and the
driver's dryrun.
"""

import os

# Force CPU: the ambient environment may point JAX at a (slow, tunneled) TPU
# via JAX_PLATFORMS=axon; unit tests are correctness tests and run on the
# virtual 8-device CPU mesh. Set TPC_TEST_PLATFORM to override.
os.environ["JAX_PLATFORMS"] = os.environ.get("TPC_TEST_PLATFORM", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# XLA:CPU collective rendezvous has a termination timeout that EXITS the
# process ("Exiting to ensure a consistent program state") when not all
# 8 virtual-device threads get scheduled in time. On a 1-CPU host under
# load that fires spuriously mid-suite (observed as a silent SIGABRT in
# block_until_ready — pytest's fd capture swallows the LOG(FATAL) text).
# Raise it far beyond any plausible scheduling delay.
if "xla_cpu_collective" not in xla_flags:
    xla_flags += (
        " --xla_cpu_collective_timeout_seconds=3600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )
os.environ["XLA_FLAGS"] = xla_flags
# Keep test numerics deterministic and float32-strict.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; the config update below wins as long as no backend has been
# initialized yet (conftest runs before any test imports).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

# The suite is compile-bound (many small jits per test on one CPU core);
# the persistent compilation cache makes repeat runs start hot.
try:
    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache(
        os.environ.get("TPC_TEST_XLA_CACHE", "/tmp/tpc_xla_test_cache")
    )
except Exception:
    pass

import pytest  # noqa: E402

# `pytest -m smoke`: the <2-minute sanity tier (VERDICT r4 task 8) — one
# native-coder round trip, one device-rANS round trip, one entropy-model
# round trip, one model-level compress/decompress, and the container wire
# format. Centralized here (nodeid substrings) instead of scattering marks
# across files; `-m "not slow"` remains the fast CI-of-record pass.
_SMOKE_NODEIDS = (
    "test_codec.py::TestRangeCoderRoundTrip::"
    "test_cpp_roundtrip_and_bit_exact_vs_numpy",
    "test_rans.py::test_batched_streams_are_independent",
    "test_entropy_models.py",  # batched-EM class round-trip tests are quick
    "test_bls2017.py::test_compress_decompress_roundtrip",
    "test_packed_tensors.py",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SMOKE_NODEIDS):
            item.add_marker(pytest.mark.smoke)
