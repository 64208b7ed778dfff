"""Per-params codec cache.

The coding path needs three one-time artifacts per (model, params): jitted
transform functions, and the integer CDF tables. The module-level
``compress``/``decompress`` convenience functions in each model family
build a Codec once per params pytree and reuse it — without this, every
call would re-trace the transforms and re-build the range-coder tables
(exactly the overhead the reference pays in its Session-based CLI, and the
first thing the bench exposed).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

__all__ = ["cached"]

_CACHE: Dict[int, Tuple[Any, Any]] = {}


def tables_via_disk(build: Callable[[], Dict[str, Any]]) -> Dict[str, Any]:
    """Loads/saves named CDF tables at $TPC_TABLE_CACHE_FILE when set.

    Table building is seconds-to-minutes of host math per trained model but
    a pure function of the checkpoint; the CLI sets the env var to a path
    derived from the checkpoint file so every process after the first loads
    the integer tables directly. (The reference gets the same effect by
    storing CDF tables as variables inside its checkpoints.)
    """
    import os

    from compression_tpu.entropy_models.continuous_base import (
        load_tables,
        save_tables,
    )

    path = os.environ.get("TPC_TABLE_CACHE_FILE")
    if path and os.path.exists(path):
        return load_tables(path)
    tables = build()
    if path:
        save_tables(path, tables)
    return tables


def cached(key_obj, builder: Callable):
    """Returns builder() memoized on the identity of ``key_obj``.

    The cache keeps a strong reference to ``key_obj`` so the id cannot be
    recycled while the entry lives; bounded by simple FIFO eviction.
    """
    k = id(key_obj)
    entry = _CACHE.get(k)
    if entry is not None and entry[0] is key_obj:
        return entry[1]
    value = builder()
    if len(_CACHE) > 8:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[k] = (key_obj, value)
    return value
