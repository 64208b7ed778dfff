"""Codec tests: round-trip, C++-vs-NumPy bit-exactness, rate sanity."""

import numpy as np
import pytest

from compression_tpu.codec import _numpy_ref as ref
from compression_tpu.codec import host


def _random_cdf_table(rng, num_cdfs, num_symbols, precision):
    """Random valid CDF rows (num_symbols includes the escape symbol)."""
    pmf = rng.dirichlet(np.ones(num_symbols) * 0.5, size=num_cdfs)
    rows = []
    for r in range(num_cdfs):
        rows.append(ref.pmf_to_quantized_cdf(pmf[r], precision))
    cdfs = np.stack(rows)  # [num_cdfs, num_symbols + 1]
    lengths = np.full((num_cdfs,), num_symbols + 1, np.int32)
    offsets = rng.integers(-10, 10, size=num_cdfs).astype(np.int32)
    return cdfs.astype(np.int32), lengths, offsets


class TestPmfToQuantizedCdf:
    @pytest.mark.parametrize("precision", [8, 12, 16])
    def test_total_and_monotone(self, precision):
        rng = np.random.default_rng(0)
        pmf = rng.dirichlet(np.ones(17))
        cdf = ref.pmf_to_quantized_cdf(pmf, precision)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << precision
        assert np.all(np.diff(cdf) >= 1)  # every symbol codable

    def test_cpp_matches_numpy(self):
        rng = np.random.default_rng(1)
        for precision in (8, 12, 16):
            for n in (2, 3, 7, 33, 200):
                pmf = rng.dirichlet(np.ones(n) * rng.uniform(0.1, 3))
                expected = ref.pmf_to_quantized_cdf(pmf, precision)
                got = host.pmf_to_quantized_cdf(
                    pmf[None], np.array([n], np.int32), precision
                )[0]
                np.testing.assert_array_equal(got[: n + 1], expected)

    def test_ragged_rows(self):
        rng = np.random.default_rng(2)
        lengths = np.array([3, 8, 5], np.int32)
        pmf = np.zeros((3, 8))
        for i, L in enumerate(lengths):
            pmf[i, :L] = rng.dirichlet(np.ones(L))
        cdf = host.pmf_to_quantized_cdf(pmf, lengths, 12)
        for i, L in enumerate(lengths):
            assert cdf[i, 0] == 0 and cdf[i, L] == 1 << 12
            assert np.all(np.diff(cdf[i, : L + 1]) >= 1)

    def test_tiny_probabilities_survive(self):
        pmf = np.array([1.0, 1e-12, 1e-12])
        cdf = ref.pmf_to_quantized_cdf(pmf, 8)
        assert np.all(np.diff(cdf) >= 1)


class TestRangeCoderRoundTrip:
    @pytest.mark.parametrize("precision", [8, 12, 16])
    def test_numpy_roundtrip(self, precision):
        rng = np.random.default_rng(3)
        cdfs, lengths, offsets = _random_cdf_table(rng, 4, 16, precision)
        n = 500
        indexes = rng.integers(0, 4, n)
        # values mostly in range, some escapes
        values = offsets[indexes] + rng.integers(-3, 20, n)
        data = ref.entropy_encode(values, indexes, cdfs, lengths, offsets, precision)
        decoded = ref.entropy_decode(data, indexes, cdfs, lengths, offsets, precision)
        np.testing.assert_array_equal(decoded, values)

    @pytest.mark.parametrize("precision", [8, 12, 16])
    def test_cpp_roundtrip_and_bit_exact_vs_numpy(self, precision):
        rng = np.random.default_rng(4)
        cdfs, lengths, offsets = _random_cdf_table(rng, 6, 12, precision)
        batch, n = 3, 400
        indexes = rng.integers(0, 6, (batch, n)).astype(np.int32)
        values = (offsets[indexes] + rng.integers(-4, 15, (batch, n))).astype(np.int32)
        strings = host.entropy_encode(values, indexes, cdfs, lengths, offsets, precision)
        # Bit-exact equality with the NumPy spec, stream by stream.
        for b in range(batch):
            expected = ref.entropy_encode(
                values[b], indexes[b], cdfs, lengths, offsets, precision
            )
            assert strings[b] == expected, f"stream {b} differs from spec"
        decoded = host.entropy_decode(strings, indexes, cdfs, lengths, offsets, precision)
        np.testing.assert_array_equal(decoded, values)

    def test_extreme_escape_values(self):
        rng = np.random.default_rng(5)
        cdfs, lengths, offsets = _random_cdf_table(rng, 2, 4, 12)
        values = np.array([[-(2**20), 2**20, 0, -1, 123456, -654321]], np.int32)
        indexes = np.array([[0, 1, 0, 1, 0, 1]], np.int32)
        strings = host.entropy_encode(values, indexes, cdfs, lengths, offsets, 12)
        decoded = host.entropy_decode(strings, indexes, cdfs, lengths, offsets, 12)
        np.testing.assert_array_equal(decoded, values)

    def test_empty_stream(self):
        cdfs = np.array([[0, 2048, 4096]], np.int32)
        lengths = np.array([3], np.int32)
        offsets = np.array([0], np.int32)
        strings = host.entropy_encode(
            np.zeros((1, 0), np.int32), np.zeros((1, 0), np.int32),
            cdfs, lengths, offsets, 12,
        )
        decoded = host.entropy_decode(strings, np.zeros((1, 0), np.int32),
                                      cdfs, lengths, offsets, 12)
        assert decoded.shape == (1, 0)

    def test_single_symbol_rows_all_escape(self):
        # A row with only the escape symbol: everything overflows, still lossless.
        cdfs = np.array([[0, 4096]], np.int32)
        lengths = np.array([2], np.int32)
        offsets = np.array([0], np.int32)
        values = np.array([[5, -7, 0, 100]], np.int32)
        indexes = np.zeros((1, 4), np.int32)
        strings = host.entropy_encode(values, indexes, cdfs, lengths, offsets, 12)
        decoded = host.entropy_decode(strings, indexes, cdfs, lengths, offsets, 12)
        np.testing.assert_array_equal(decoded, values)

    def test_rate_close_to_entropy(self):
        # Coding iid symbols from a known PMF should cost ~ entropy.
        rng = np.random.default_rng(6)
        precision = 16
        pmf = np.array([0.5, 0.2, 0.15, 0.1, 0.04, 0.01])
        cdf = ref.pmf_to_quantized_cdf(pmf, precision)[None]
        lengths = np.array([7], np.int32)
        offsets = np.array([0], np.int32)
        n = 20000
        values = rng.choice(len(pmf), size=(1, n), p=pmf).astype(np.int32)
        # keep the escape symbol (last index) unused in the draw above?
        # pmf has 6 entries; escape = index 5 which IS drawn with p=.01: fine,
        # escapes of value 5 cost extra gamma bits — include margin.
        indexes = np.zeros((1, n), np.int32)
        strings = host.entropy_encode(values, indexes, cdf, lengths, offsets, precision)
        entropy = -np.sum(pmf * np.log2(pmf))
        bits = len(strings[0]) * 8
        assert bits / n < entropy * 1.05 + 0.1, (bits / n, entropy)
        decoded = host.entropy_decode(strings, indexes, cdf, lengths, offsets, precision)
        np.testing.assert_array_equal(decoded, values)

    def test_fuzz_cpp_vs_numpy(self):
        rng = np.random.default_rng(7)
        for trial in range(20):
            precision = int(rng.integers(2, 17))
            num_cdfs = int(rng.integers(1, 8))
            num_symbols = int(rng.integers(1, min(40, 1 << precision)))
            cdfs, lengths, offsets = _random_cdf_table(
                rng, num_cdfs, num_symbols, precision
            )
            n = int(rng.integers(1, 300))
            indexes = rng.integers(0, num_cdfs, (1, n)).astype(np.int32)
            spread = int(rng.integers(2, 50))
            values = (
                offsets[indexes] + rng.integers(-spread, spread, (1, n))
            ).astype(np.int32)
            got = host.entropy_encode(values, indexes, cdfs, lengths, offsets, precision)
            expected = ref.entropy_encode(
                values[0], indexes[0], cdfs, lengths, offsets, precision
            )
            assert got[0] == expected, f"trial {trial}: C++ != NumPy spec"
            back = host.entropy_decode(got, indexes, cdfs, lengths, offsets, precision)
            np.testing.assert_array_equal(back, values, err_msg=f"trial {trial}")


class TestRunLengthGamma:
    def test_roundtrip_sparse(self):
        rng = np.random.default_rng(8)
        values = np.zeros(1000, np.int32)
        nz = rng.integers(0, 1000, 50)
        values[nz] = rng.integers(-100, 100, 50)
        data = host.run_length_gamma_encode(values)
        decoded = host.run_length_gamma_decode(data, (1000,))
        np.testing.assert_array_equal(decoded, values)

    def test_roundtrip_dense_and_edge(self):
        for values in [
            np.array([], np.int32),
            np.array([0], np.int32),
            np.array([1], np.int32),
            np.array([-1, 1, -2, 2], np.int32),
            np.zeros(100, np.int32),
            np.arange(-50, 50, dtype=np.int32),
        ]:
            data = host.run_length_gamma_encode(values)
            decoded = host.run_length_gamma_decode(data, values.shape)
            np.testing.assert_array_equal(decoded, values)

    def test_sparse_is_small(self):
        values = np.zeros(10000, np.int32)
        values[::1000] = 1
        data = host.run_length_gamma_encode(values)
        assert len(data) < 100


def test_worst_case_escape_capacity():
    """Every symbol escaping at int32 extremes must fit encode_capacity."""
    cdfs = np.array([[0, 1, 4096]], np.int32)  # 1 regular symbol + escape
    lengths = np.array([3], np.int32)
    offsets = np.array([0], np.int32)
    vals = np.array(
        [[2**31 - 1, -(2**31) + 1, 2**30, -(2**30)] * 64], np.int32
    )
    idx = np.zeros_like(vals)
    s = host.entropy_encode(vals, idx, cdfs, lengths, offsets, 12)
    back = host.entropy_decode(s, idx, cdfs, lengths, offsets, 12)
    np.testing.assert_array_equal(back, vals)
    assert len(s[0]) <= host.encode_capacity(vals.size, 12)


class TestXlaCdf:
    """XLA PMF->CDF quantizer must match the authoritative C++ row-for-row
    (same host float64; SURVEY §2.1 N3 'do both and cross-check')."""

    def test_matches_cpp_random_rows(self):
        import numpy as np
        from compression_tpu.codec import (
            pmf_to_quantized_cdf,
            pmf_to_quantized_cdf_xla,
        )

        rng = np.random.RandomState(0)
        num, max_len = 24, 17
        lengths = rng.randint(2, max_len + 1, num).astype(np.int32)
        pmf = rng.dirichlet(np.ones(max_len), num)
        # Pathological rows: zeros, non-finite, huge dynamic range.
        pmf[0] = 0.0
        pmf[1, : lengths[1]] = [np.inf] + [1.0] * (lengths[1] - 1)
        pmf[2, : lengths[2]] = 10.0 ** -rng.uniform(0, 18, lengths[2])
        for prec in (8, 12, 16):
            want = pmf_to_quantized_cdf(pmf, lengths, prec)
            got = np.asarray(pmf_to_quantized_cdf_xla(pmf, lengths, prec))
            np.testing.assert_array_equal(got, want)

    def test_inside_jit(self):
        import jax
        import numpy as np
        import jax.numpy as jnp
        from compression_tpu.codec import pmf_to_quantized_cdf_xla

        @jax.jit
        def build(pmf, lengths):
            return pmf_to_quantized_cdf_xla(pmf, lengths, 12)

        pmf = jnp.asarray([[0.5, 0.3, 0.2, 0.0]], jnp.float64)
        cdf = np.asarray(build(pmf, jnp.asarray([3], jnp.int32)))
        assert cdf[0, 0] == 0 and cdf[0, 3] == 1 << 12 and cdf[0, 4] == 0
