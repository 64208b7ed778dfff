"""Codec-in-jit tests: pure_callback encode/decode round trip under jit."""

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.codec import _numpy_ref as ref
from compression_tpu.codec.jax_ops import make_jax_decoder, make_jax_encoder
from compression_tpu.entropy_models.continuous_base import CdfTables


def _tables(num_cdfs=4, num_symbols=12, precision=12, seed=0):
    rng = np.random.default_rng(seed)
    pmf = rng.dirichlet(np.ones(num_symbols) * 0.7, size=num_cdfs)
    rows = [ref.pmf_to_quantized_cdf(pmf[r], precision) for r in range(num_cdfs)]
    cdf = np.stack(rows).astype(np.int32)
    return CdfTables(
        cdf=cdf,
        cdf_length=np.full((num_cdfs,), num_symbols + 1, np.int32),
        cdf_offset=rng.integers(-5, 5, num_cdfs).astype(np.int32),
        offset=np.zeros(num_cdfs),
        precision=precision,
    )


def test_roundtrip_inside_jit():
    tables = _tables()
    enc = make_jax_encoder(tables)
    dec = make_jax_decoder(tables)
    rng = np.random.default_rng(1)
    indexes = rng.integers(0, 4, (3, 200)).astype(np.int32)
    values = (
        tables.cdf_offset[indexes] + rng.integers(-2, 10, (3, 200))
    ).astype(np.int32)

    @jax.jit
    def roundtrip(v, idx):
        data, lengths = enc(v, idx)
        return dec(data, lengths, idx), lengths

    out, lengths = roundtrip(jnp.asarray(values), jnp.asarray(indexes))
    np.testing.assert_array_equal(np.asarray(out), values)
    assert np.all(np.asarray(lengths) > 0)


def test_jit_encode_matches_host_bytes():
    from compression_tpu.codec import host

    tables = _tables(seed=2)
    enc = make_jax_encoder(tables)
    rng = np.random.default_rng(3)
    indexes = rng.integers(0, 4, (2, 100)).astype(np.int32)
    values = (tables.cdf_offset[indexes] + rng.integers(0, 8, (2, 100))).astype(
        np.int32
    )
    data, lengths = jax.jit(enc)(jnp.asarray(values), jnp.asarray(indexes))
    expected = host.entropy_encode(
        values, indexes, tables.cdf, tables.cdf_length, tables.cdf_offset,
        tables.precision,
    )
    for i in range(2):
        got = np.asarray(data[i, : int(lengths[i])]).tobytes()
        assert got == expected[i]
