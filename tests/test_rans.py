"""Device rANS coder: XLA implementation vs the NumPy spec, round trips,
escape handling, rate sanity vs the host range coder."""

import numpy as np
import jax.numpy as jnp
import pytest

from compression_tpu.codec import rans, rans_ref
from compression_tpu.codec._numpy_ref import pmf_to_quantized_cdf
from compression_tpu.entropy_models.continuous_base import CdfTables


def _random_tables(rng, R=6, P=12, max_syms=24):
    rows, lengths, offsets = [], [], []
    for _ in range(R):
        n = rng.randint(2, max_syms)  # n symbols incl the escape symbol
        pmf = rng.rand(n) ** 2 + 1e-3
        rows.append(pmf_to_quantized_cdf(pmf, P))
        lengths.append(n + 1)
        offsets.append(rng.randint(-20, 20))
    maxlen = max(len(c) for c in rows)
    cdf = np.zeros((R, maxlen), np.int32)
    for r, c in enumerate(rows):
        cdf[r, : len(c)] = c
    return CdfTables(
        cdf=cdf,
        cdf_length=np.array(lengths, np.int32),
        cdf_offset=np.array(offsets, np.int32),
        offset=np.zeros(R),
        precision=P,
    )


def _random_elements(rng, tables, N, escape_frac=0.1):
    R = tables.num_cdfs
    rows = rng.randint(0, R, N).astype(np.int32)
    lo = tables.cdf_offset[rows]
    n_sym = tables.cdf_length[rows] - 2
    vals = np.where(
        rng.rand(N) < 1 - escape_frac,
        lo + (rng.rand(N) * np.maximum(n_sym, 1)).astype(np.int64),
        rng.randint(-5000, 5000, N),
    ).astype(np.int32)
    return vals, rows


@pytest.mark.parametrize("N,K", [(64, 4), (1000, 16), (37, 8), (128, 128)])
def test_xla_encode_matches_numpy_spec(N, K):
    rng = np.random.RandomState(N + K)
    tables = _random_tables(rng)
    vals, rows = _random_elements(rng, tables, N)
    ref_bytes = rans_ref.rans_encode(vals, rows, tables, K)

    cap = N * 3 + 2 * K + 8
    enc = rans.make_rans_encoder(tables, K, cap)
    stream, lengths, overflow = enc(
        jnp.asarray(vals)[None], jnp.asarray(rows)[None]
    )
    assert not bool(overflow[0])
    words = np.asarray(stream[0, : int(lengths[0])])
    assert words.tobytes() == ref_bytes


@pytest.mark.parametrize("N,K", [(64, 4), (1000, 16), (37, 8)])
def test_xla_roundtrip_and_spec_decode(N, K):
    rng = np.random.RandomState(2 * N + K)
    tables = _random_tables(rng)
    vals, rows = _random_elements(rng, tables, N, escape_frac=0.25)
    cap = N * 3 + 2 * K + 8
    enc = rans.make_rans_encoder(tables, K, cap)
    dec = rans.make_rans_decoder(tables, K, N)
    stream, lengths, overflow = enc(
        jnp.asarray(vals)[None], jnp.asarray(rows)[None]
    )
    assert not bool(overflow[0])
    out, ok = dec(stream, jnp.asarray(rows)[None])
    assert bool(ok[0])
    np.testing.assert_array_equal(np.asarray(out[0]), vals)
    # The NumPy spec decodes the XLA stream too (same format).
    spec = rans_ref.rans_decode(
        np.asarray(stream[0, : int(lengths[0])]).tobytes(),
        rows, tables, K, N,
    )
    np.testing.assert_array_equal(spec, vals)


def test_batched_streams_are_independent():
    rng = np.random.RandomState(77)
    tables = _random_tables(rng)
    N, K, B = 256, 16, 4
    vals = np.stack(
        [_random_elements(rng, tables, N)[0] for _ in range(B)]
    )
    rows = np.stack(
        [_random_elements(rng, tables, N)[1] for _ in range(B)]
    )
    cap = N * 3 + 2 * K + 8
    enc = rans.make_rans_encoder(tables, K, cap)
    dec = rans.make_rans_decoder(tables, K, N)
    stream, lengths, overflow = enc(jnp.asarray(vals), jnp.asarray(rows))
    assert not np.any(np.asarray(overflow))
    out, ok = dec(stream, jnp.asarray(rows))
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), vals)
    # Each batch element's stream equals its solo encode (independence).
    for b in range(B):
        solo = rans_ref.rans_encode(vals[b], rows[b], tables, K)
        assert np.asarray(stream[b, : int(lengths[b])]).tobytes() == solo


def test_degenerate_full_mass_row():
    """A row whose single symbol owns all 2^P mass codes 0 bits (push is
    an exact identity) — the f<<(32-P) overflow trap."""
    P = 12
    cdf = np.zeros((1, 3), np.int32)
    cdf[0] = [0, 1 << P, 0]  # one real symbol... needs escape too
    # Minimal legal row: 1 data symbol + escape: lengths=3 means 2 symbols.
    pmf = np.array([4095.0, 1.0])
    cdf = pmf_to_quantized_cdf(pmf, P)[None]
    tables = CdfTables(
        cdf=cdf.astype(np.int32),
        cdf_length=np.array([3], np.int32),
        cdf_offset=np.array([0], np.int32),
        offset=np.zeros(1),
        precision=P,
    )
    N, K = 100, 8
    vals = np.zeros(N, np.int32)  # all the dominant symbol
    rows = np.zeros(N, np.int32)
    cap = N * 3 + 2 * K + 8
    enc = rans.make_rans_encoder(tables, K, cap)
    dec = rans.make_rans_decoder(tables, K, N)
    stream, lengths, _ = enc(jnp.asarray(vals)[None], jnp.asarray(rows)[None])
    out, ok = dec(stream, jnp.asarray(rows)[None])
    assert bool(ok[0])
    np.testing.assert_array_equal(np.asarray(out[0]), vals)
    # Nearly all mass on one symbol: stream ~= just the state flush.
    assert int(lengths[0]) <= 2 * K + N // 8
    ref = rans_ref.rans_encode(vals, rows, tables, K)
    assert np.asarray(stream[0, : int(lengths[0])]).tobytes() == ref


def test_rate_close_to_host_coder():
    """Same tables, same symbols: rANS total bytes within ~5% + lane
    overhead of the host range coder (both code to the table entropy)."""
    from compression_tpu.codec import _numpy_ref

    rng = np.random.RandomState(5)
    tables = _random_tables(rng, R=8, max_syms=40)
    N, K = 20000, 64
    vals, rows = _random_elements(rng, tables, N, escape_frac=0.02)
    host = _numpy_ref.entropy_encode(
        vals, rows, tables.cdf, tables.cdf_length, tables.cdf_offset,
        tables.precision,
    )
    dev = rans_ref.rans_encode(vals, rows, tables, K)
    overhead = 4 * K
    assert len(dev) <= len(host) * 1.05 + overhead
    assert len(dev) + 64 >= len(host) * 0.9  # and not implausibly small


def test_divmod32_exact_over_adversarial_grid():
    """The encoder's division-free state update (_divmod32) must equal true
    u32 divmod everywhere the coder can reach: full-range numerators,
    divisors 1..2**15 (the precision<=15 bound RansTables asserts), with
    exact-multiple +/-1 neighborhoods where float rounding is riskiest."""
    rng = np.random.RandomState(7)
    n = rng.randint(0, 2**32, 50_000, dtype=np.uint64).astype(np.uint32)
    d = np.concatenate(
        [
            rng.randint(1, 2**15 + 1, len(n) - 4096).astype(np.uint32),
            np.ones(2048, np.uint32),
            np.full(2048, 2**15, np.uint32),
        ]
    )
    mult = (n.astype(np.uint64) // d * d).astype(np.uint32)
    N = np.concatenate([n, mult, mult - 1, mult + 1])
    D = np.concatenate([d] * 4)
    q, r = rans._divmod32(jnp.asarray(N), jnp.asarray(D))
    np.testing.assert_array_equal(
        np.asarray(q), (N.astype(np.uint64) // D).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(r), (N.astype(np.uint64) % D).astype(np.uint32)
    )

def test_divmod32_tpu_overshoot_regression_vector():
    """Recorded operand pairs where the axon TPU's f32 reciprocal-divide
    overshoots the floor(q) estimate by +1 ulp. The original unsigned
    wraparound correction turned that overshoot into a ~2**32/d final
    error (both its predicates fire on a wrapped remainder and the wrong
    branch won); the sign-aware correction must repair it. On CPU the
    divide is correctly rounded and these pass trivially — the pairs are
    kept so any accelerator run of the suite exercises the exact recorded
    failure (first seen 2026-08-20: bench.py device roundtrip failed on
    the real chip while the CPU grid stayed green)."""
    N = np.array(
        [3242368409, 4048944566, 3291050008, 2487324566, 3652154634],
        dtype=np.uint32,
    )
    D = np.array([3, 6835, 73, 648, 102], dtype=np.uint32)
    q, r = rans._divmod32(jnp.asarray(N), jnp.asarray(D))
    np.testing.assert_array_equal(
        np.asarray(q), (N.astype(np.uint64) // D).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(r), (N.astype(np.uint64) % D).astype(np.uint32)
    )
