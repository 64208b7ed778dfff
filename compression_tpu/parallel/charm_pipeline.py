"""CHARM slice-pipelined decoding.

ms2020 decode is 10 *serial* slice steps per image: device computes
(mu_i, sigma_i), host range-decodes slice i, device applies LRP
(SURVEY.md §3.3). Within one image the chain is a true data dependency —
slice i+1's parameters consume slice i's *decoded* values, so no machine
can start slice i+1's transforms before the host coder finishes slice i.
What can be engineered away is everything *around* that chain:

* **slice batching** (``ms2020.Codec.decompress_batch``): N images decode
  in lockstep, so the batch pays 10 device<->host round-trips total
  instead of 10 per image, and every range-decode call carries N streams
  for the native coder's thread pool;
* **batch staggering** (``decompress_batch_pipelined`` /
  ``Codec.decompress_iter``): with ``depth`` batches in flight on worker
  threads, the device computes batch B's slice parameters while the host
  range-decodes batch A's current slice — the only overlap the serial
  chain admits on one chip.

This module is the convenience front end over those Codec paths: it
groups same-shape blobs into device batches and staggers the batches.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import List

import numpy as np

__all__ = ["decompress_batch_pipelined"]


def decompress_batch_pipelined(
    model,
    params,
    packed_blobs: List[bytes],
    depth: int = 2,
    batch_size: int = 8,
) -> List[np.ndarray]:
    """Decodes many .tfci blobs: same-shape blobs are slice-batched onto
    the device, and up to ``depth`` batches are staggered so host range
    decoding overlaps the next batch's device work. Results keep input
    order."""
    from compression_tpu.models import ms2020
    from compression_tpu.util import PackedTensors

    codec = ms2020.make_codec(model, params)

    # Group into batches of identical padded shape (lockstep decode needs
    # uniform shapes; mixed inputs fall into separate groups). Only the
    # 2-int shape field is decoded here — the slice bitstreams are parsed
    # once, inside decompress_batch.
    def shape_key(blob: bytes):
        packed = PackedTensors(blob)
        return tuple(
            int(v)
            for v in packed.unpack_one(codec.cfg.num_slices + 1, np.int32)
        )

    groups: List[List[int]] = []
    by_shape = {}
    for i, blob in enumerate(packed_blobs):
        k = shape_key(blob)
        if k not in by_shape or len(groups[by_shape[k]]) >= batch_size:
            by_shape[k] = len(groups)
            groups.append([])
        groups[by_shape[k]].append(i)

    results: List[np.ndarray] = [None] * len(packed_blobs)  # type: ignore
    with cf.ThreadPoolExecutor(max_workers=max(1, depth)) as pool:
        futs = {
            pool.submit(
                codec.decompress_batch, [packed_blobs[i] for i in idxs]
            ): idxs
            for idxs in groups
        }
        for fut in cf.as_completed(futs):
            out = fut.result()
            for j, i in enumerate(futs[fut]):
                results[i] = out[j]
    return results
