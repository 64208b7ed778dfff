"""Persistent XLA compilation cache.

Every CLI invocation is a fresh process; without a persistent cache each
pays full jit-compile latency for the same transform graphs (tens of
seconds per shape on TPU). Enabling the JAX compilation cache makes every
process after the first start hot.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "TPC_COMPILATION_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "compression_tpu", "xla"
        ),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
