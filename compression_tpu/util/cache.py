"""Persistent XLA compilation cache.

Every CLI invocation is a fresh process; without a persistent cache each
pays full jit-compile latency for the same transform graphs (tens of
seconds per shape on TPU). Enabling the JAX compilation cache makes every
process after the first start hot.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["enable_compilation_cache", "host_fingerprint"]


def host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU persists AOT-compiled kernels that target the COMPILING host's
    ISA extensions; loading them on a host without those features is a
    SIGILL at run time (observed: a VM migration changed avx/amx flags and
    a cached 8-device program aborted the test suite mid-run). Scoping the
    cache directory by this fingerprint turns that crash into a clean
    cache miss."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        line.encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "TPC_COMPILATION_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "compression_tpu", "xla"
        ),
    )
    path = os.path.join(path, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
