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


def host_fingerprint(include_model: bool = False) -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU persists AOT-compiled kernels that target the COMPILING host's
    ISA extensions; loading them on a host without those features is a
    SIGILL at run time (observed: a VM migration changed avx/amx flags and
    a cached 8-device program aborted the test suite mid-run). Scoping the
    cache directory by this fingerprint turns that crash into a clean
    cache miss.

    With ``include_model=True`` the hash also covers the CPU *model name*:
    LLVM target tuning features (e.g. ``prefer-no-gather``) are derived
    from the CPU model and do not appear in /proc/cpuinfo flags, so two
    VMs with identical flag lists can still produce incompatible AOT
    entries (observed as cpu_aot_loader feature-mismatch errors on a
    1-core VM whose flags matched the compiling host's).  The model name
    is only folded in for CPU-platform processes — TPU executables are
    device code, keying them by host CPU would orphan the (expensively
    tunnel-compiled) TPU cache on every VM move."""
    try:
        flags_line = model_line = None
        with open("/proc/cpuinfo") as f:
            for line in f:
                if flags_line is None and line.startswith("flags"):
                    flags_line = line
                elif model_line is None and line.startswith("model name"):
                    model_line = line
                if flags_line is not None and (
                    model_line is not None or not include_model
                ):
                    break
        if flags_line is not None:
            # include_model=False hashes the raw flags line exactly as
            # before this parameter existed — existing (TPU) cache dirs
            # keyed by that hash must keep resolving.
            ident = flags_line if not include_model else (
                (model_line or "") + flags_line
            )
            return hashlib.sha256(ident.encode()).hexdigest()[:12]
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
    # CPU-platform processes get the stricter (flags + model name)
    # fingerprint — they load XLA:CPU AOT kernels where a host mismatch is
    # a SIGILL.  TPU/other platforms key by flags only, preserving the
    # tunnel-compiled device executables across host VM changes.  The
    # platform is read from config/env without initializing a backend.
    platforms = str(
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS", "")
    )
    is_cpu = platforms.split(",")[0].strip() == "cpu" if platforms else False
    path = os.path.join(path, host_fingerprint(include_model=is_cpu))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
