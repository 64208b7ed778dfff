"""Attribute the rANS ENCODE time: prep vs scan-arith vs div/mod vs the
final order-reversing scatter (decides the next compute_only optimization;
decode was attributed by tools/diag_rans_scan.py).

BENCH r5 (after fc-packing): rans_enc 112 ms per 8-image batch. The
encode pipeline is
  prep     — element fields + ONE fc gather on [B, N] + 6 [T,B,K] preps
  scan     — T steps of u32 arithmetic incl. ONE div+mod by the per-
             element freq (u32 division is microcoded on the VPU — a
             candidate wall)
  scatter  — the order-reversing emission: [B, T*3K+2K] candidate words
             scattered to their final stream positions (~2% are real)
Variants time ablated versions of the same jitted encode at the bench's
real N/K/B so the dominant term is measured, not guessed:

  full      — the real encoder (reference point)
  noscatter — scan runs, emission replaced by sums (no flatten/scatter)
  nodiv     — scatter runs, div/mod replaced by adds (INVALID stream,
              same memory traffic and op count otherwise)
  prep      — element fields + fc gather + [T,B,K] preps only

Usage: flock /tmp/r3fc.lock env PYTHONPATH=/root/repo:$PYTHONPATH \
  python tools/diag_rans_enc.py [K]
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
    from compression_tpu.codec import rans
    from compression_tpu.models import bmshj2018, common

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
    off_np = np.asarray(tb.cdf_offset)[rows_np]
    esc_np = np.asarray(tb.cdf_length)[rows_np] - 2
    vals = jax.device_put(jnp.asarray(
        off_np + rng.randint(0, 7, (B, N)) % np.maximum(esc_np, 1),
        jnp.int32,
    ))

    t = rans.RansTables(codec.em.tables)
    P = t.precision
    _L = np.uint32(1 << 16)
    _M16 = np.uint32(0xFFFF)
    cap_words = 3 * N + 2 * K + 64

    def make_enc(no_scatter: bool, no_div: bool, prep_only: bool):
        def encode(values, rows):
            Bv, Nv = values.shape
            T = -(-Nv // K)
            m, escaped, e = rans._element_fields(t, values, rows)
            valid = jnp.ones((Bv, Nv), bool)
            f, c = t.freq_cum(rows, m)

            def prep(x, fill):
                return jnp.moveaxis(
                    rans._pad_TK(x, T, K, fill), 1, 0
                )[::-1]

            xs = (
                prep(f, 1),
                prep(c, 0),
                prep(escaped, False),
                prep((e & _M16).astype(jnp.uint32), 0),
                prep((e >> 16).astype(jnp.uint32), 0),
                prep(valid, False),
            )
            if prep_only:
                return tuple(x.sum() for x in xs[:2])
            x0 = jnp.full((Bv, K), _L, jnp.uint32)

            def step(x, sl):
                f, c, esc, e_lo, e_hi, valid = sl
                esc = esc & valid
                v_hi = (x & _M16).astype(jnp.uint16)
                x = jnp.where(esc, ((x >> 16) << 16) | e_hi, x)
                v_lo = (x & _M16).astype(jnp.uint16)
                x = jnp.where(esc, ((x >> 16) << 16) | e_lo, x)
                em = valid & ((x >> (32 - P)) >= f)
                v_m = (x & _M16).astype(jnp.uint16)
                x1 = jnp.where(em, x >> 16, x)
                fs = jnp.where(valid, f, 1)
                if no_div:
                    x2 = x1 + c  # invalid stream, same traffic
                else:
                    x2 = ((x1 // fs) << P) + (x1 % fs) + c
                x = jnp.where(valid, x2, x)
                vals_ = jnp.stack([v_hi, v_lo, v_m], axis=1)
                masks = jnp.stack([esc, esc, em], axis=1)
                return x, (vals_, masks)

            x, (vals_, masks) = jax.lax.scan(step, x0, xs)
            if no_scatter:
                return (
                    vals_.astype(jnp.uint32).sum(),
                    masks.sum(),
                    x.sum(),
                )
            vals_ = jnp.moveaxis(vals_, 1, 0)[..., ::-1].reshape(Bv, -1)
            masks = jnp.moveaxis(masks, 1, 0)[..., ::-1].reshape(Bv, -1)
            xr = x[:, ::-1]
            flush = jnp.stack(
                [(xr & _M16), (xr >> 16)], axis=-1
            ).reshape(Bv, 2 * K).astype(jnp.uint16)
            vals_ = jnp.concatenate([vals_, flush], axis=1)
            masks = jnp.concatenate(
                [masks, jnp.ones((Bv, 2 * K), bool)], axis=1
            )
            idx = jnp.cumsum(masks, axis=1) - 1
            total = idx[:, -1] + 1
            pos = total[:, None] - 1 - idx
            pos = jnp.where(masks & (pos < cap_words), pos, cap_words)
            buf = jnp.zeros((Bv, cap_words + 1), jnp.uint16)
            buf = jax.vmap(lambda b, p, v: b.at[p].set(v))(buf, pos, vals_)
            return buf[:, :cap_words].sum(), total.astype(jnp.int32)

        return jax.jit(encode)

    variants = [
        ("full", make_enc(False, False, False)),
        ("noscatter", make_enc(True, False, False)),
        ("nodiv", make_enc(False, True, False)),
        ("prep", make_enc(False, False, True)),
    ]
    for name, fn in variants:
        out = fn(vals, rows)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(vals, rows)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        T = -(-N // K)
        print(f"{name:<10} {ms:7.1f} ms/batch  (K={K}, T={T})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
