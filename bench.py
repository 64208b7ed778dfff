"""Benchmark: bmshj2018 encode+decode throughput on Kodak-sized images.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.md) is bmshj2018 end-to-end
encode+decode images/sec/chip on 768x512 (Kodak-sized) inputs: device
transforms + host-side native range coding, i.e. the full compress() /
decompress() product path including bitstream (de)serialization.
``vs_baseline`` is measured against the reference's CPU throughput —
unavailable in this sandbox (BASELINE.md: unmeasured), so a conservative
1.0 img/s placeholder is used until the reference can be timed.
"""

from __future__ import annotations

import json
import time

import numpy as np

# The reference's CPU img/s for bmshj2018 encode+decode. Not yet measurable
# here (see BASELINE.md); 1.0 is the placeholder divisor.
BASELINE_IMG_PER_S = 1.0


def main():
    import os

    import jax

    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    # Persist range-coder tables across bench runs (pure function of the
    # fixed-seed params used below).
    os.environ.setdefault("TPC_TABLE_CACHE_FILE", "/tmp/tpc_bench_tables.npz")

    from compression_tpu.models import bmshj2018

    cfg = bmshj2018.Config()
    model = bmshj2018.BMSHJ2018Model(cfg)
    rng = np.random.RandomState(0)
    image = (rng.rand(512, 768, 3) * 255).astype(np.uint8)
    x0 = np.zeros((1, 512, 768, 3), np.float32)
    # Init on host CPU (values are arbitrary for a throughput bench; no
    # need to compile the init program for the accelerator). The codec jits
    # close over the params, so they are shipped to the device once.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
    # Un-commit from the CPU: closed-over params committed to another
    # device would drag the codec jits off the accelerator.
    params = jax.device_put(params, jax.devices()[0])

    # Batched serving path: N images per device dispatch, native coder
    # fanning streams across host threads.
    batch = 8
    images = np.stack([image] * batch)
    codec = bmshj2018.make_codec(model, params)

    # Warmup (compiles transforms; builds CDF tables once).
    blobs = codec.compress_batch(images)
    out = codec.decompress_batch(blobs)
    assert out.shape == images.shape

    rounds = 4
    t0 = time.perf_counter()
    for _ in range(rounds):
        blobs = codec.compress_batch(images)
        out = codec.decompress_batch(blobs)
    dt = time.perf_counter() - t0
    img_per_s = rounds * batch / dt

    print(
        json.dumps(
            {
                "metric": "bmshj2018_encode_decode_throughput",
                "value": round(img_per_s, 3),
                "unit": "img/s/chip (768x512)",
                "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
