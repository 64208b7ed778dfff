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

from typing import Any, Callable, Dict, Optional, Tuple

__all__ = ["cached", "invalidate", "register_table_cache", "tables_via_disk"]

_CACHE: Dict[int, Tuple[Any, Any]] = {}

# id(params) -> (params, table cache path). Registered by checkpoint loaders
# (CLI, bench) so each params pytree is bound to ITS OWN on-disk table file —
# a process-global env var would silently serve model A's CDF tables to
# model B in a long-lived process that loads several checkpoints (advisor
# finding, round 1). $TPC_TABLE_CACHE_FILE remains as a single-model
# fallback for scripts.
_TABLE_PATHS: Dict[int, Tuple[Any, str]] = {}


def register_table_cache(key_obj, path: str) -> None:
    """Binds an on-disk CDF-table cache path to a params pytree."""
    if len(_TABLE_PATHS) > 16:
        _TABLE_PATHS.pop(next(iter(_TABLE_PATHS)))
    _TABLE_PATHS[id(key_obj)] = (key_obj, path)


def tables_via_disk(
    build: Callable[[], Dict[str, Any]], key_obj=None
) -> Dict[str, Any]:
    """Loads/saves named CDF tables bound to ``key_obj`` (see
    :func:`register_table_cache`), falling back to $TPC_TABLE_CACHE_FILE.

    Table building is seconds-to-minutes of host math per trained model but
    a pure function of the checkpoint, so every process after the first
    loads the integer tables directly. (The reference gets the same effect
    by storing CDF tables as variables inside its checkpoints.)
    """
    import os

    from compression_tpu.entropy_models.continuous_base import (
        load_tables,
        save_tables,
    )

    path: Optional[str] = None
    if key_obj is not None:
        entry = _TABLE_PATHS.get(id(key_obj))
        if entry is not None and entry[0] is key_obj:
            path = entry[1]
    if path is None:
        path = os.environ.get("TPC_TABLE_CACHE_FILE")
    if path and os.path.exists(path):
        return load_tables(path)
    tables = build()
    if path:
        save_tables(path, tables)
    return tables


def invalidate(key_obj) -> None:
    """Drops the codec and table-path entries bound to ``key_obj``.

    The cache holds strong references to the params pytrees it keys on
    (dicts are not weakref-able), which pins their device memory for the
    process lifetime under FIFO-only eviction; callers retiring a params
    pytree (e.g. a server swapping checkpoints) call this to free it
    (advisor finding, round 1).
    """
    _CACHE.pop(id(key_obj), None)
    _TABLE_PATHS.pop(id(key_obj), None)


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
