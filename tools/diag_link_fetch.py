"""Diagnose the decode-side image-fetch bandwidth (VERDICT r4 task 4).

BENCH_r04: dec/fetch_image moved 8x768x512x3 uint8 (9.4 MB) in ~953 ms
(~10 MB/s effective) while the same day's 8 MB float32 probe measured
34 MB/s d2h. This script isolates WHERE the 3.4x goes:

  a. d2h of one (8,512,768,3) uint8 batch (the product fetch)
  b. d2h of the same bytes as int32 words (dtype penalty?)
  c. d2h of the same bytes as float32 (the probe's dtype, same size)
  d. 8 per-image uint8 fetches issued copy_to_host_async first
     (latency pipelining — does splitting help or hurt?)
  e. h2d/d2h 8 MB float32 probe for the day's link reference

Run while holding the chip lock: flock /tmp/r3fc.lock python
tools/diag_link_fetch.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return med


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    img = (np.random.RandomState(0).rand(8, 512, 768, 3) * 255).astype(
        np.uint8
    )
    nbytes = img.nbytes
    x_u8 = jax.device_put(jnp.asarray(img), dev)
    x_u8.block_until_ready()
    x_i32 = jax.device_put(
        jnp.asarray(img.reshape(8, 512, 2304).view(np.int32)), dev
    )
    x_f32 = jax.device_put(jnp.asarray(img, jnp.float32), dev)
    jax.block_until_ready((x_i32, x_f32))

    t = timed("u8 batch", lambda: np.asarray(jax.device_get(x_u8)))
    print(f"a. one uint8 batch d2h     {nbytes / 2**20:6.1f} MB  "
          f"{t * 1e3:7.1f} ms  {nbytes / 2**20 / t:6.1f} MB/s")
    t = timed("i32 batch", lambda: np.asarray(jax.device_get(x_i32)))
    print(f"b. same bytes as int32     {nbytes / 2**20:6.1f} MB  "
          f"{t * 1e3:7.1f} ms  {nbytes / 2**20 / t:6.1f} MB/s")
    t = timed("f32 batch", lambda: np.asarray(jax.device_get(x_f32)))
    print(f"c. same values as float32  {4 * nbytes / 2**20:6.1f} MB  "
          f"{t * 1e3:7.1f} ms  {4 * nbytes / 2**20 / t:6.1f} MB/s")

    def per_image_async():
        outs = []
        for i in range(8):
            a = x_u8[i]
            a.copy_to_host_async()
            outs.append(a)
        return [np.asarray(o) for o in outs]

    # Pre-slice once so the timed region is transfer, not slicing compiles.
    per_image_async()
    t = timed("u8 per-img", per_image_async)
    print(f"d. 8 per-image async u8    {nbytes / 2**20:6.1f} MB  "
          f"{t * 1e3:7.1f} ms  {nbytes / 2**20 / t:6.1f} MB/s")

    buf = np.zeros((2 * 1024 * 1024,), np.float32)
    a = jax.device_put(buf, dev)
    a.block_until_ready()
    t = timed("probe d2h", lambda: np.asarray(jax.device_get(a)))
    print(f"e. 8 MB f32 probe d2h       8.0 MB  {t * 1e3:7.1f} ms  "
          f"{8.0 / t:6.1f} MB/s")
    th = timed("probe h2d", lambda: jax.device_put(buf, dev).block_until_ready())
    print(f"   8 MB f32 probe h2d       8.0 MB  {th * 1e3:7.1f} ms  "
          f"{8.0 / th:6.1f} MB/s")


if __name__ == "__main__":
    main()
