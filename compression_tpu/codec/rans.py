"""Device entropy coder: K-lane interleaved rANS in pure XLA.

Implements the bitstream format specified (and NumPy-executed) by
:mod:`compression_tpu.codec.rans_ref` — see that module's docstring for the
format and for WHY this exists (the host range coder forces a symbols+rows
device->host transfer ~50x larger than the compressed bytes; rANS runs the
coder *on the TPU* as `lax.scan` over u32 lane states with table gathers,
so only compressed words cross the link).

Shapes: everything is batched. ``encode(values, rows) ->
(stream u16[B, cap], lengths i32[B], overflow bool[B])`` and
``decode(stream, rows) -> (values i32[B, N], ok bool[B])`` where N is the
per-image element count and lanes K divide the work as lane = j mod K.

TPU notes (pallas_guide.md): the scan body is pure VPU work — u32
arithmetic, compares, and 4 gathers of width B*K per pop; there is no MXU
work and no dynamic shape anywhere. A Pallas kernel could fuse the gathers
into VMEM-resident tables, but the lax.scan form is already link-bound
end-to-end, so per the guide's own advice the kernel is left as a measured
future optimization.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec.rans_ref import build_slot_table

__all__ = ["RansTables", "make_rans_encoder", "make_rans_decoder"]

_L = np.uint32(1 << 16)
_M16 = np.uint32(0xFFFF)


class RansTables:
    """Device-resident table bundle derived from a CdfTables.

    The per-symbol (freq, cum) pair is PACKED into one int32 —
    ``fc[r, m] = (cdf[r, m+1] - cdf[r, m]) << 16 | cdf[r, m]`` — so a
    freq_cum lookup costs ONE device gather instead of two. Gathers are
    the measured wall of the rANS scan (tools/diag_rans_scan.py: table
    gathers 53 ms + stream reads 83 ms of the 162 ms decode batch, and
    the K-sweep shows element-throughput-bound behavior, so halving the
    gathered elements halves the stage). Packing is lossless for
    precision <= 15 (f <= 2^P fits 16 bits); the entropy-model stack
    builds 12-bit tables (continuous_base.py), asserted below.
    """

    def __init__(self, tables):
        self.precision = int(tables.precision)
        if self.precision > 15:
            raise ValueError(
                f"rANS fc-packing requires precision <= 15 (f must fit "
                f"16 bits); got {self.precision}"
            )
        self.cdf_offset = jnp.asarray(tables.cdf_offset, jnp.int32)
        self.escape = jnp.asarray(tables.cdf_length - 2, jnp.int32)  # [R]
        cdf_np = np.asarray(tables.cdf)
        f_np = cdf_np[:, 1:] - cdf_np[:, :-1]          # [R, maxlen-1]
        self.fc = jnp.asarray(
            (f_np.astype(np.int32) << 16) | cdf_np[:, :-1].astype(np.int32),
            jnp.int32,
        )
        self.slot2sym = jnp.asarray(
            build_slot_table(
                cdf_np,
                np.asarray(tables.cdf_length),
                self.precision,
            ),
            jnp.int32,
        )
        self.num_rows = int(tables.cdf.shape[0])
        self.maxlen = int(tables.cdf.shape[1])

    def freq_cum(self, r, m):
        """(f, c) as uint32 for symbol m of row r (vectorized, ONE gather).

        Valid for m in [0, cdf_length-2] of row r — every symbol incl.
        the escape symbol, same domain the two-gather form served (m+1
        never crossed its row there either; see _element_fields)."""
        v = jnp.take(
            self.fc.reshape(-1), r * (self.maxlen - 1) + m, mode="clip"
        )
        return (
            (v >> 16).astype(jnp.uint32),
            (v & 0xFFFF).astype(jnp.uint32),
        )

    def symbol_at_slot(self, r, slot):
        return jnp.take(
            self.slot2sym.reshape(-1),
            r * (1 << self.precision) + slot.astype(jnp.int32),
            mode="clip",
        )


def _element_fields(t: RansTables, values, rows):
    """Per-element (m, escaped, e) — the symbol mapping of the spec."""
    off = jnp.take(t.cdf_offset, rows, mode="clip")
    E = jnp.take(t.escape, rows, mode="clip")
    s = values - off
    escaped = ~((s >= 0) & (s < E))
    m = jnp.where(escaped, E, s)
    e = jnp.where(
        s >= E,
        (s - E).astype(jnp.uint32) * 2,
        (-s).astype(jnp.uint32) * 2 - 1,
    )
    return m, escaped, e


def _divmod24(n, d):
    """Exact (n // d, n % d) for u32 n < 2**24, d in [1, 2**15].

    Both fit a float32 mantissa exactly, so one f32 divide + floor gives a
    quotient within a few of truth; a SIGNED remainder then corrects it
    deterministically. Still ~12 cheap VPU ops vs the multi-op microcoded
    u32 integer division.

    The correction must be sign-aware: the TPU (axon) lowers f32 divide to
    a reciprocal-multiply that is NOT correctly rounded (measured +1 ulp on
    this platform, vs CPU's 0.5-ulp IEEE divide), so floor(q) can land
    ABOVE the true quotient. An earlier unsigned-wraparound check
    (`r = n - q*d; under = r >= d; over = r > n`, under taking precedence)
    mis-repaired exactly that case — q too large wraps r to ~2**32, which
    satisfies BOTH predicates, and the under branch pushed q further up;
    in :func:`_divmod32` the wrecked remainder then poisons the second
    long-division step (observed final error ~2**32/d on ~1e-4 of random
    u32 operands, TPU only — CPU's correctly-rounded divide never produced
    an overshoot, which is why the CPU test grid missed it). The signed
    form classifies over/undershoot unambiguously, and two correction
    rounds per side cover a +/-2 integer error, double the measured bound.
    """
    di = d.astype(jnp.int32)
    q = jnp.floor(n.astype(jnp.float32) / d.astype(jnp.float32)).astype(
        jnp.int32
    )
    r = n.astype(jnp.int32) - q * di  # |q err| <= 2 => r in (-2d, n + 2d)
    for _ in range(2):
        hi = r >= di  # q too small
        q = jnp.where(hi, q + 1, q)
        r = jnp.where(hi, r - di, r)
    for _ in range(2):
        lo = r < 0  # q too large (overshot floor)
        q = jnp.where(lo, q - 1, q)
        r = jnp.where(lo, r + di, r)
    return q.astype(jnp.uint32), r.astype(jnp.uint32)


def _divmod32(n, d):
    """Exact (n // d, n % d) for full-range u32 n, d in [1, 2**15]:
    schoolbook long division in two 24-bit-safe :func:`_divmod24` steps,
    n = a*2**8 + b. Both operands stay f32-exact: a < 2**24, and the
    second step's r1*2**8 + b < d*2**8 + 2**8 <= 2**23 + 2**8."""
    a = n >> 8
    b = n & jnp.uint32(0xFF)
    q1, r1 = _divmod24(a, d)
    t = (r1 << 8) | b
    q2, r2 = _divmod24(t, d)
    return (q1 << 8) + q2, r2


def _pad_TK(x, T, K, fill):
    B, N = x.shape
    pad = T * K - N
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((B, pad), fill, x.dtype)], axis=1
        )
    return x.reshape(B, T, K)


def make_rans_encoder(tables, K: int, cap_words: int):
    """Builds ``encode(values i32[B,N], rows i32[B,N])`` (jit-friendly)."""
    t = RansTables(tables)
    P = t.precision

    def encode(values, rows):
        B, N = values.shape
        T = -(-N // K)
        m, escaped, e = _element_fields(t, values, rows)
        valid = jnp.ones((B, N), bool)
        f, c = t.freq_cum(rows, m)
        # [B, T, K] -> scan over reversed t with [T, B, K] slices.
        def prep(x, fill):
            return jnp.moveaxis(_pad_TK(x, T, K, fill), 1, 0)[::-1]

        xs = (
            prep(f, 1),
            prep(c, 0),
            prep(escaped, False),
            prep((e & _M16).astype(jnp.uint32), 0),
            prep((e >> 16).astype(jnp.uint32), 0),
            prep(valid, False),
        )
        x0 = jnp.full((B, K), _L, jnp.uint32)

        def step(x, sl):
            f, c, esc, e_lo, e_hi, valid = sl
            esc = esc & valid
            # push hi (bypass always emits)
            v_hi = (x & _M16).astype(jnp.uint16)
            x = jnp.where(esc, ((x >> 16) << 16) | e_hi, x)
            # push lo
            v_lo = (x & _M16).astype(jnp.uint16)
            x = jnp.where(esc, ((x >> 16) << 16) | e_lo, x)
            # push main (renorm-before-push, at most one word). The
            # threshold test is x >= f << (32-P), computed as a shift of x
            # so a degenerate full-mass row (f == 2^P) cannot wrap the
            # left-shift to 0 — there the push is an exact identity and
            # correctly emits nothing.
            em = valid & ((x >> (32 - P)) >= f)
            v_m = (x & _M16).astype(jnp.uint16)
            x1 = jnp.where(em, x >> 16, x)
            fs = jnp.where(valid, f, 1)
            # Division-free state update: u32 //,% are microcoded multi-op
            # sequences on the VPU; _divmod32 is ~12 cheap ops and exact.
            q, rem = _divmod32(x1, fs)
            x2 = (q << P) + rem + c
            x = jnp.where(valid, x2, x)
            vals = jnp.stack([v_hi, v_lo, v_m], axis=1)      # [B, 3, K]
            masks = jnp.stack([esc, esc, em], axis=1)
            return x, (vals, masks)

        x, (vals, masks) = jax.lax.scan(step, x0, xs)
        # Executed emission order: scan step ascending (element step
        # descending), slot (hi, lo, main), lane DESCENDING. Flatten that
        # order, append the state flush (lanes K-1..0: lo then hi), then
        # reverse into decode order by scattering to (total-1-i).
        vals = jnp.moveaxis(vals, 1, 0)[..., ::-1].reshape(B, -1)  # [B,T*3*K]
        masks = jnp.moveaxis(masks, 1, 0)[..., ::-1].reshape(B, -1)
        xr = x[:, ::-1]
        flush = jnp.stack(
            [(xr & _M16), (xr >> 16)], axis=-1
        ).reshape(B, 2 * K).astype(jnp.uint16)
        vals = jnp.concatenate([vals, flush], axis=1)
        masks = jnp.concatenate(
            [masks, jnp.ones((B, 2 * K), bool)], axis=1
        )
        idx = jnp.cumsum(masks, axis=1) - 1
        total = idx[:, -1] + 1                                # [B]
        pos = total[:, None] - 1 - idx
        pos = jnp.where(masks & (pos < cap_words), pos, cap_words)
        buf = jnp.zeros((B, cap_words + 1), jnp.uint16)
        buf = jax.vmap(lambda b, p, v: b.at[p].set(v))(buf, pos, vals)
        overflow = total > cap_words
        return buf[:, :cap_words], total.astype(jnp.int32), overflow

    return encode


def make_rans_decoder(tables, K: int, N: int):
    """Builds ``decode(stream u16[B,cap], rows i32[B,N])`` (jit-friendly)."""
    t = RansTables(tables)
    P = t.precision
    Pmask = np.uint32((1 << P) - 1)

    def decode(stream, rows):
        B = stream.shape[0]
        cap = stream.shape[1]
        T = -(-N // K)
        E = jnp.take(t.escape, rows, mode="clip")
        off = jnp.take(t.cdf_offset, rows, mode="clip")
        valid = jnp.ones((B, N), bool)

        def prep(x, fill):
            return jnp.moveaxis(_pad_TK(x, T, K, fill), 1, 0)

        xs = (prep(rows, 0), prep(E, 0), prep(valid, False))
        # Init: lane k's state = (word[2k] << 16) | word[2k+1].
        head = stream[:, : 2 * K].astype(jnp.uint32).reshape(B, K, 2)
        x0 = (head[..., 0] << 16) | head[..., 1]
        p0 = jnp.full((B,), 2 * K, jnp.int32)

        def read(x, p, need, renew):
            """Masked word read in ascending-lane order; returns new x."""
            offs = jnp.cumsum(need.astype(jnp.int32), axis=1) - need
            idx = jnp.clip(p[:, None] + offs, 0, cap - 1)
            words = jnp.take_along_axis(stream, idx, axis=1).astype(
                jnp.uint32
            )
            x = jnp.where(need, (renew << 16) | words, x)
            return x, p + jnp.sum(need, axis=1, dtype=jnp.int32)

        def step(carry, sl):
            x, p = carry
            r, E, valid = sl
            # main pop
            slot = (x & Pmask).astype(jnp.uint32)
            m = t.symbol_at_slot(r, slot)
            f, c = t.freq_cum(r, m)
            x1 = f * (x >> P) + slot - c
            need = valid & (x1 < _L)
            # read() already selects between the renormed word-read and its
            # input (which is x1-where-valid) per `need`.
            x, p = read(jnp.where(valid, x1, x), p, need, x1)
            esc = valid & (m == E)

            # Escape pops (lo then hi) behind a step-level branch: escapes
            # are rare in a trained codec, and the two full-width stream
            # gathers they need are the scan's measured wall
            # (diag_rans_scan: stream reads ~84 ms of the 144 ms batch) —
            # lax.cond executes ONE branch on TPU, so escape-free steps
            # (the common case) skip both gathers entirely. Semantics are
            # identical: with esc all-false the pops are no-ops by
            # construction (read() masks by `need`).
            def esc_pops(args):
                x, p = args
                b_lo = (x & _M16)
                xw, p = read(x, p, esc, x >> 16)
                x = jnp.where(esc, xw, x)
                b_hi = (x & _M16)
                xw, p = read(x, p, esc, x >> 16)
                x = jnp.where(esc, xw, x)
                e = (b_hi << 16) | b_lo
                s_esc = jnp.where(
                    e % 2 == 0,
                    E + (e >> 1).astype(jnp.int32),
                    -((e >> 1).astype(jnp.int32) + 1),
                )
                return x, p, s_esc

            x, p, s_esc = jax.lax.cond(
                jnp.any(esc),
                esc_pops,
                lambda args: (args[0], args[1], jnp.zeros_like(m)),
                (x, p),
            )
            s = jnp.where(esc, s_esc, m)
            return (x, p), s

        (x, _p), sym = jax.lax.scan(step, (x0, p0), xs)
        ok = jnp.all(x == _L, axis=1)
        sym = jnp.moveaxis(sym, 0, 1).reshape(B, T * K)[:, :N]
        return sym + off, ok

    return decode
