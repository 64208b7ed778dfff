"""Bench: staged host-path decode vs the single-compiled-program decode.

Answers VERDICT r2 item 6's bench question — does in-jit coding (two
pure_callbacks inside one compiled program) help or hurt on the tunneled
chip vs the staged path (5 dispatches, host round-trips for z_hat/sigma/
rows)? Run AFTER training (uses the cached bench checkpoint from bench.py,
training one if absent). Prints a small table to stdout.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
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
    from compression_tpu.models import bmshj2018, common

    cfg = bmshj2018.Config()
    model = bmshj2018.BMSHJ2018Model(cfg)
    h, w = 512, 768
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), np.zeros((1, h, w, 3), np.float32),
            jax.random.PRNGKey(1), training=True,
        )
    ckpt = "/tmp/tpc_bench_ckpt.msgpack"
    if os.path.exists(ckpt):
        params, _ = common.load_checkpoint(ckpt, params)
    else:
        tc = common.TrainConfig(
            train_glob=None, batch_size=2, patch_size=128, steps=60,
            log_every=60,
        )
        _, params = bmshj2018.train(cfg, tc, params=params)
        common.save_checkpoint(ckpt, params, step=60)
    params = jax.device_put(params, jax.devices()[0])
    from compression_tpu.models.codec_cache import register_table_cache

    st = os.stat(ckpt)
    register_table_cache(params, f"{ckpt}.{st.st_mtime_ns}.tables.npz")

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    image = np.stack(
        [xx / w * 255, yy / h * 255,
         (np.sin(xx / 17) * np.cos(yy / 23) * 0.5 + 0.5) * 255], -1,
    )
    image = np.clip(
        image + np.random.RandomState(0).randn(h, w, 3) * 4, 0, 255
    ).astype(np.uint8)
    batch = 8
    codec = bmshj2018.make_codec(model, params)
    blobs = codec.compress_batch(np.stack([image] * batch))

    # Warm both paths (compiles).
    ref = codec.decompress_batch(blobs)
    out = codec.decompress_batch_jit(blobs)
    if not np.array_equal(out, ref):
        print("MISMATCH: jit decode != host decode", file=sys.stderr)
        return 1

    rounds = 4
    t0 = time.perf_counter()
    for _ in range(rounds):
        codec.decompress_batch(blobs)
    t_host = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(rounds):
        codec.decompress_batch_jit(blobs)
    t_jit = time.perf_counter() - t0
    n = rounds * batch
    print(
        f"decode 768x512 batch {batch}: staged {n / t_host:.3f} img/s, "
        f"in-jit single-program {n / t_jit:.3f} img/s "
        f"(ratio {t_host / t_jit:.2f}x; byte-exact outputs)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
