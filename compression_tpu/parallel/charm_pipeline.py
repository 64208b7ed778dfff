"""CHARM slice-pipelined decoding.

ms2020 decode is 10 *serial* slice steps per image: device computes
(mu_i, sigma_i), host range-decodes slice i, device applies LRP
(SURVEY.md §3.3). Within one image the chain is a true dependency — but
across a batch of images the stages interleave: while the host decodes
image A's slice i, the device computes image B's slice parameters. This
module staggers images through that two-stage software pipeline so the
device never waits on the host coder in steady state (the overlap demanded
by SURVEY.md §5 "slice-parallel CHARM").

Implementation: one worker thread per in-flight image drives its serial
slice chain; JAX dispatches device work asynchronously from every thread
onto the same TPU stream, and host decode blocks only its own image's
thread. ``depth`` bounds in-flight images (memory).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import List

import numpy as np

__all__ = ["decompress_batch_pipelined"]


def decompress_batch_pipelined(
    model, params, packed_blobs: List[bytes], depth: int = 2
) -> List[np.ndarray]:
    """Decodes many .tfci blobs with image-level slice pipelining."""
    from compression_tpu.models import ms2020

    results: List[np.ndarray] = [None] * len(packed_blobs)  # type: ignore
    with cf.ThreadPoolExecutor(max_workers=max(1, depth)) as pool:
        futs = {
            pool.submit(ms2020.decompress, model, params, blob): i
            for i, blob in enumerate(packed_blobs)
        }
        for fut in cf.as_completed(futs):
            results[futs[fut]] = fut.result()
    return results
