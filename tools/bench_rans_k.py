"""Measure rANS lane-count (K) scaling: device compute vs rate overhead.

The on-device coder (codec/rans.py) runs as a lax.scan of T = N/K steps;
BENCH_r04's stage table shows the scan latency — not the transforms — is
what bounds the device-resident throughput (enc/fetch on the device path
is a wait on the encode scan). More lanes mean fewer, wider scan steps
(VPU-friendly) at the price of a bigger per-image state flush (2K u16
words) and per-lane quantization of the stream. This tool measures both
sides of the trade on the real chip so the default K cap is a measured
choice, not a guess.

Usage (takes the chip lock the same way the queue does):
  flock /tmp/r3fc.lock python tools/bench_rans_k.py [K ...]
Prints one line per K: compute-only img/s + mean stream bytes/image.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(ks=(64, 128, 256, 512, 1024)):
    import jax
    import jax.numpy as jnp

    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench
    from compression_tpu.models import bmshj2018, common

    cfg = bmshj2018.Config()
    model = bmshj2018.BMSHJ2018Model(cfg)
    h, w = 512, 768
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    image = np.stack(
        [xx / w * 255, yy / h * 255,
         (np.sin(xx / 17) * np.cos(yy / 23) * 0.5 + 0.5) * 255], -1)
    image = np.clip(image + rng.randn(h, w, 3) * 4, 0, 255).astype(np.uint8)
    images = np.stack([image] * 8)

    x0 = np.zeros((1, h, w, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
    ckpt = bench.pick_checkpoint(tiny=False)
    params, _ = common.load_checkpoint(ckpt, params)
    params = jax.device_put(params, jax.devices()[0])
    from compression_tpu.models.codec_cache import register_table_cache
    import os

    st = os.stat(ckpt)
    register_table_cache(params, f"{ckpt}.{st.st_mtime_ns}.tables.npz")
    codec = bmshj2018.make_codec(model, params)

    # Stream-length measurement (rate overhead) per K via one real encode.
    x, _hw = codec._pad_np(images, cfg.downscale)
    x_dev = jax.device_put(jnp.asarray(x))
    _y8, _y16, _z16, z_hat, _fits, y32, _z32 = codec._front(codec._p, x_dev)
    sigma = codec._sigma(z_hat)
    rows = codec.em.rows(sigma)
    N = int(np.prod(sigma.shape[1:]))
    ri = rows.astype(jnp.int32).reshape(x.shape[0], -1)
    yv = y32.reshape(x.shape[0], -1)

    for K in ks:
        if K > max(4, N // 16):
            print(f"K={K}: skipped (exceeds N/16={N//16})")
            continue
        enc, dec, _K, _cap = codec._rans(N, K)
        stream, lengths, overflow = enc(yv, ri)
        jax.block_until_ready(lengths)
        mean_bytes = float(np.mean(np.asarray(lengths))) * 2
        # Product-mirroring decode bucket (see bench.compute_only_metric).
        bucket = 1024
        while bucket < int(np.max(np.asarray(lengths))):
            bucket *= 2
        ips, _stages = bench.compute_only_metric(codec, images, rounds=4, k=K)
        # Scan-only timing (exclude transforms): time enc+dec alone.
        values, ok = dec(stream[:, :bucket], ri)  # compile warmup
        jax.block_until_ready((values, ok))
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            stream, lengths, overflow = enc(yv, ri)
            values, ok = dec(stream[:, :bucket], ri)
        jax.block_until_ready((values, ok))
        scan_ms = (time.perf_counter() - t0) / reps * 1e3
        print(
            f"K={K}: compute_only={ips:.3f} img/s, "
            f"enc+dec scan={scan_ms:.1f} ms/batch, "
            f"stream={mean_bytes:.0f} B/img "
            f"(+{2 * 2 * K} B flush/lane-quant floor)"
        )


if __name__ == "__main__":
    ks = tuple(int(a) for a in sys.argv[1:]) or (64, 128, 256, 512, 1024)
    main(ks)
