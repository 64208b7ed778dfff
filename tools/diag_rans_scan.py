"""Attribute the rANS scan's time: stream gathers vs table gathers vs
bare scan overhead (decides the Pallas-kernel design, VERDICT r4 task 3).

BENCH r5 stage split: rans_dec 177 ms + rans_enc 131 ms per 8-image batch
= 86% of compute_only. The decode step does, per scan iteration:
  - 1 slot2sym gather + 2 cdf gathers ([B,K] from VMEM-sized tables)
  - up to 3 stream reads (take_along_axis from the [B, cap] HBM buffer)
  - u32 arithmetic (VPU)
This tool times ablated variants of the same T-step scan at the bench's
real N/K/B so the dominant term is measured, not guessed:

  full      — the real decoder (reference point)
  notables  — table gathers replaced by row-0 constants (invalid symbols,
              same memory traffic to the stream)
  nostream  — stream reads replaced by a fixed word at position 0
              (invalid bitstream; same table traffic)
  arith     — both replaced: the scan skeleton + VPU arithmetic only

Usage: flock /tmp/r3fc.lock python tools/diag_rans_scan.py [K]
"""

import sys
import time

import numpy as np


def main(K=128):
    import jax
    import jax.numpy as jnp

    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench
    from compression_tpu.models import bmshj2018, common
    from compression_tpu.codec import rans

    cfg = bmshj2018.Config()
    model = bmshj2018.BMSHJ2018Model(cfg)
    x0 = np.zeros((1, 512, 768, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(x0), jax.random.PRNGKey(1),
            training=True,
        )
    ckpt = bench.pick_checkpoint(tiny=False)
    params, _ = common.load_checkpoint(ckpt, params)
    params = jax.device_put(params, jax.devices()[0])
    import os

    from compression_tpu.models.codec_cache import register_table_cache

    st = os.stat(ckpt)
    register_table_cache(params, f"{ckpt}.{st.st_mtime_ns}.tables.npz")
    codec = bmshj2018.make_codec(model, params)

    B, N = 8, 48 * 32 * 192
    rng = np.random.RandomState(0)
    tb = codec.em.tables
    rows_np = rng.randint(0, tb.cdf.shape[0], (B, N))
    rows = jax.device_put(jnp.asarray(rows_np, jnp.int32))
    # In-range symbols (value = row offset + small nonneg < escape index):
    # symbol statistics barely move the timing, but escapes add stream
    # words, so keep the stream realistic-sized.
    off_np = np.asarray(tb.cdf_offset)[rows_np]
    esc_np = np.asarray(tb.cdf_length)[rows_np] - 2
    vals = jax.device_put(jnp.asarray(
        off_np + rng.randint(0, 7, (B, N)) % np.maximum(esc_np, 1),
        jnp.int32,
    ))
    enc, dec, _K, cap = codec._rans(N, K)
    stream, lengths, overflow = enc(vals, rows)
    jax.block_until_ready(lengths)
    bucket = 1024
    while bucket < int(np.max(np.asarray(lengths))):
        bucket *= 2
    stream_b = stream[:, :bucket]

    t = rans.RansTables(codec.em.tables)
    P = t.precision
    Pmask = np.uint32((1 << P) - 1)
    _L = np.uint32(1 << 16)
    _M16 = np.uint32(0xFFFF)

    def make_dec(no_tables: bool, no_stream: bool):
        def decode(stream, rows):
            Bv = stream.shape[0]
            capv = stream.shape[1]
            T = -(-N // K)
            E = jnp.take(t.escape, rows, mode="clip")
            valid = jnp.ones((Bv, N), bool)

            def prep(x, fill):
                Bx, Nx = x.shape
                pad = T * K - Nx
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.full((Bx, pad), fill, x.dtype)], axis=1
                    )
                return jnp.moveaxis(x.reshape(Bx, T, K), 1, 0)

            xs = (prep(rows, 0), prep(E, 0), prep(valid, False))
            head = stream[:, : 2 * K].astype(jnp.uint32).reshape(Bv, K, 2)
            x0 = (head[..., 0] << 16) | head[..., 1]
            p0 = jnp.full((Bv,), 2 * K, jnp.int32)

            def read(x, p, need, renew):
                if no_stream:
                    word = stream[:, :1].astype(jnp.uint32)
                    x = jnp.where(need, (renew << 16) | word, x)
                    return x, p + jnp.sum(need, axis=1, dtype=jnp.int32)
                offs = jnp.cumsum(need.astype(jnp.int32), axis=1) - need
                idx = jnp.clip(p[:, None] + offs, 0, capv - 1)
                words = jnp.take_along_axis(stream, idx, axis=1).astype(
                    jnp.uint32
                )
                x = jnp.where(need, (renew << 16) | words, x)
                return x, p + jnp.sum(need, axis=1, dtype=jnp.int32)

            def step(carry, sl):
                x, p = carry
                r, E, valid = sl
                slot = (x & Pmask).astype(jnp.uint32)
                if no_tables:
                    m = slot.astype(jnp.int32) & 7
                    f = jnp.full_like(x, 16)
                    c = (slot // 2).astype(jnp.uint32)
                else:
                    m = t.symbol_at_slot(r, slot)
                    f, c = t.freq_cum(r, m)
                x1 = f * (x >> P) + slot - c
                need = valid & (x1 < _L)
                x, p = read(jnp.where(valid, x1, x), p, need, x1)
                esc = valid & (m == E)
                b_lo = x & _M16
                x2 = x >> 16
                xw, p = read(x, p, esc, x2)
                x = jnp.where(esc, xw, x)
                b_hi = x & _M16
                x3 = x >> 16
                xw, p = read(x, p, esc, x3)
                x = jnp.where(esc, xw, x)
                e = (b_hi << 16) | b_lo
                s_esc = jnp.where(
                    e % 2 == 0,
                    E + (e >> 1).astype(jnp.int32),
                    -((e >> 1).astype(jnp.int32) + 1),
                )
                s = jnp.where(esc, s_esc, m)
                return (x, p), s

            (x, _p), sym = jax.lax.scan(step, (x0, p0), xs)
            return jnp.moveaxis(sym, 0, 1).reshape(Bv, T * K)[:, :N]

        return jax.jit(decode)

    variants = {
        "full": make_dec(False, False),
        "notables": make_dec(True, False),
        "nostream": make_dec(False, True),
        "arith": make_dec(True, True),
    }
    for name, fn in variants.items():
        out = fn(stream_b, rows)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(stream_b, rows)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:9s} {ms:8.1f} ms/batch  (K={K}, T={-(-N // K)})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
