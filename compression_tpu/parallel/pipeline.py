"""Host/device coding pipeline: overlap transforms with range coding.

The reference serializes device->host: every compress() call runs the
transforms, then blocks in the C++ range-coder op before the next batch
starts (reference call stack, SURVEY.md §3.2). Here the two stages are
overlapped:

* JAX dispatch is asynchronous — a jitted transform returns a future-like
  Array immediately while the TPU works;
* the native coder runs on worker threads that block on `device_get`
  (i.e. on the TPU stream) and then code, while the main thread has
  already dispatched the *next* batch's transforms.

With `depth=2` (double buffering) the steady state is: TPU computing batch
i+1 while host threads entropy-code batch i — encode throughput becomes
max(transform, coding) instead of their sum.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterable, Iterator, List, TypeVar

import jax

__all__ = ["Pipeline", "pipeline_map", "staggered_map"]

T = TypeVar("T")
U = TypeVar("U")


class Pipeline:
    """Two-stage device/host pipeline.

    Args:
      device_fn: batch -> device arrays (jitted; dispatches asynchronously).
      host_fn: device arrays -> host result (blocks on the arrays, then runs
        host-side work — e.g. the native range coder).
      depth: number of batches in flight (2 = double buffering).
    """

    def __init__(self, device_fn: Callable, host_fn: Callable, depth: int = 2):
        self.device_fn = device_fn
        self.host_fn = host_fn
        self.depth = max(1, int(depth))

    def run(self, batches: Iterable) -> Iterator:
        with cf.ThreadPoolExecutor(max_workers=self.depth) as pool:
            inflight: List[cf.Future] = []
            for batch in batches:
                out = self.device_fn(batch)  # async dispatch
                inflight.append(pool.submit(self.host_fn, out))
                while len(inflight) >= self.depth:
                    yield inflight.pop(0).result()
            for fut in inflight:
                yield fut.result()


def pipeline_map(device_fn, host_fn, batches, depth: int = 2) -> List:
    """Eager convenience wrapper; returns results in order."""
    return list(Pipeline(device_fn, host_fn, depth).run(batches))


def staggered_map(fn: Callable, items: Iterable, depth: int = 2) -> Iterator:
    """Runs ``fn`` over ``items`` with up to ``depth`` calls in flight on
    worker threads, yielding results in input order.

    The decoder-side staggering primitive: each ``fn`` mixes async device
    dispatch with blocking host range-decoding, so with two in flight the
    device computes batch B's transforms while the host decodes batch A
    (the only overlap a serial per-batch decode chain admits on one chip).
    Shared by the mbt2018/ms2020 ``decompress_iter`` paths.
    """
    depth = max(1, int(depth))
    with cf.ThreadPoolExecutor(max_workers=depth) as pool:
        inflight: List[cf.Future] = []
        for item in items:
            inflight.append(pool.submit(fn, item))
            while len(inflight) >= depth:
                yield inflight.pop(0).result()
        for fut in inflight:
            yield fut.result()
