"""JAX bindings for the native codec: coding inside jitted programs.

`jax.pure_callback` wrappers over :mod:`compression_tpu.codec.host` so a
fully-jitted pipeline (e.g. a `lax.scan` over CHARM slices, or a pjit-ed
serving graph) can invoke the range coder without leaving the compiled
program. This is the `gen_ops`-equivalent surface of the reference
(reference: tensorflow_compression/python/ops/gen_ops.py + the
CreateRangeEncoder/EntropyEncode* op family) — with the difference that
bitstreams inside jit must be fixed-capacity: encode returns a
``(uint8[batch, capacity], int32[batch])`` (data, length) pair rather than
variable-length strings.

The CDF tables are static (host NumPy) and are closed over, not traced —
they never transit the device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import host
from compression_tpu.entropy_models.continuous_base import CdfTables

__all__ = ["make_jax_encoder", "make_jax_decoder"]


def make_jax_encoder(tables: CdfTables, capacity_per_symbol: int | None = None):
    """Builds ``encode(symbols, indexes) -> (data, lengths)`` usable in jit.

    Args:
      tables: prebuilt CDF tables (static).
      capacity_per_symbol: output buffer bytes per symbol; None (default)
        uses codec.host.encode_capacity — the single source of truth for
        the worst-case escape bound.

    The returned function takes int32 ``symbols``/``indexes`` of shape
    ``(batch, n)`` and returns ``data: uint8[batch, cap]``,
    ``lengths: int32[batch]``.
    """

    def _cap(n: int) -> int:
        if capacity_per_symbol is None:
            return host.encode_capacity(int(n), tables.precision)
        return capacity_per_symbol * int(n) + 64

    def _host_encode(symbols, indexes):
        symbols = np.asarray(symbols)
        indexes = np.asarray(indexes)
        batch, n = symbols.shape
        cap = _cap(n)
        strings = host.entropy_encode(
            symbols, indexes, tables.cdf, tables.cdf_length,
            tables.cdf_offset, tables.precision,
        )
        data = np.zeros((batch, cap), np.uint8)
        lengths = np.zeros((batch,), np.int32)
        for i, s in enumerate(strings):
            if len(s) > cap:
                raise ValueError(
                    f"stream {i} ({len(s)}B) exceeds capacity {cap}B"
                )
            data[i, : len(s)] = np.frombuffer(s, np.uint8)
            lengths[i] = len(s)
        return data, lengths

    def encode(symbols, indexes):
        batch, n = symbols.shape
        cap = _cap(n)
        out_shapes = (
            jax.ShapeDtypeStruct((batch, cap), jnp.uint8),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
        )
        return jax.pure_callback(
            _host_encode, out_shapes, symbols, indexes, vmap_method="sequential"
        )

    return encode


def make_jax_decoder(tables: CdfTables):
    """Builds ``decode(data, lengths, indexes) -> values`` usable in jit.

    ``data: uint8[batch, cap]``, ``lengths: int32[batch]``,
    ``indexes: int32[batch, n]`` -> ``values: int32[batch, n]``.
    """

    def _host_decode(data, lengths, indexes):
        data = np.asarray(data)
        lengths = np.asarray(lengths)
        indexes = np.asarray(indexes)
        strings = [
            data[i, : lengths[i]].tobytes() for i in range(data.shape[0])
        ]
        values = host.entropy_decode(
            strings, indexes, tables.cdf, tables.cdf_length,
            tables.cdf_offset, tables.precision,
        )
        return np.asarray(values, np.int32).reshape(indexes.shape)

    def decode(data, lengths, indexes):
        out_shape = jax.ShapeDtypeStruct(indexes.shape, jnp.int32)
        return jax.pure_callback(
            _host_decode, out_shape, data, lengths, indexes,
            vmap_method="sequential",
        )

    return decode
