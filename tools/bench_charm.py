"""CHARM decode benchmark: serial vs slice-batched vs staggered (BASELINE
config #4 evidence).

ms2020 decode is a true 10-step channel-autoregressive chain per image
(slice i+1's parameters consume slice i's decoded values), so the
engineering wins live AROUND the chain: decoding N images in lockstep (10
device<->host round-trips per batch instead of per image) and staggering
batches so the host range-decoder overlaps the next batch's device work
(parallel/charm_pipeline.py). This tool measures all three on the real
chip and prints one JSON line.

Usage: python tools/bench_charm.py  (needs the trained ms2020 checkpoint)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import os

    import jax

    # Honor an explicit CPU-only request (JAX_PLATFORMS=cpu smoke); only
    # that case is overridden — the ambient default keeps both backends
    # registered since host-side work pins to the cpu backend.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()

    from compression_tpu.cli import registry
    from compression_tpu.models import common, ms2020
    from compression_tpu.models.codec_cache import register_table_cache
    from compression_tpu.parallel.charm_pipeline import (
        decompress_batch_pipelined,
    )

    entry, ckpt = registry.resolve("ms2020")
    if ckpt is None:
        print("no ms2020 checkpoint; train one first", file=sys.stderr)
        return 1
    model = entry.make_model()
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
    params, _ = common.load_checkpoint(ckpt, params)
    params = jax.device_put(params, jax.devices()[0])
    import os

    st = os.stat(ckpt)
    register_table_cache(params, f"{ckpt}.{st.st_mtime_ns}.tables.npz")

    # Kodak-sized synthetic batch (same generator as bench.py).
    h, w, batch, rounds = 512, 768, 8, 2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    image = np.stack(
        [xx / w * 255, yy / h * 255,
         (np.sin(xx / 17) * np.cos(yy / 23) * 0.5 + 0.5) * 255], -1
    )
    image = np.clip(
        image + np.random.RandomState(0).randn(h, w, 3) * 4, 0, 255
    ).astype(np.uint8)
    images = np.stack([image] * batch)

    codec = ms2020.make_codec(model, params)
    blobs = codec.compress_batch(images)
    # Warm all decode paths (compiles).
    codec.decompress(blobs[0])
    codec.decompress_batch(blobs)
    decompress_batch_pipelined(model, params, blobs * rounds, depth=2,
                               batch_size=batch)

    n = batch * rounds
    t0 = time.perf_counter()
    for b in blobs * rounds:
        codec.decompress(b)                      # per-image serial loop
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(rounds):
        codec.decompress_batch(blobs)            # slice-batched lockstep
    t_batched = time.perf_counter() - t0

    t0 = time.perf_counter()
    decompress_batch_pipelined(
        model, params, blobs * rounds, depth=2, batch_size=batch
    )                                            # + batch staggering
    t_staggered = time.perf_counter() - t0

    # Device-coded (on-TPU K-lane rANS, commit ccc5749): the 10-slice
    # chain runs as async device dispatches — no symbols or CDF rows ever
    # cross the link, only compressed words.
    dblobs = codec.compress_batch(images, coder="device")
    codec.decompress_batch(dblobs)               # warm (compiles)
    t0 = time.perf_counter()
    for _ in range(rounds):
        codec.decompress_batch(dblobs)
    t_device = time.perf_counter() - t0

    print(
        f"serial {n / t_serial:.3f} img/s | batched {n / t_batched:.3f} "
        f"img/s | staggered {n / t_staggered:.3f} img/s | device-coded "
        f"{n / t_device:.3f} img/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "ms2020_charm_decode",
        "serial_img_s": round(n / t_serial, 3),
        "slice_batched_img_s": round(n / t_batched, 3),
        "staggered_img_s": round(n / t_staggered, 3),
        "device_coded_img_s": round(n / t_device, 3),
        "speedup_batched": round(t_serial / t_batched, 3),
        "speedup_staggered": round(t_serial / t_staggered, 3),
        "speedup_device": round(t_serial / t_device, 3),
        "unit": "img/s/chip (768x512)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
