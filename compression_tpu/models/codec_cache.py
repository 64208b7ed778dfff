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
