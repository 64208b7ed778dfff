"""Batched entropy model (the reference's EntropyBottleneck role).

Re-design of ContinuousBatchedEntropyModel (reference:
tensorflow_compression/python/entropy_models/continuous_batched.py:30-450;
v1 alias `EntropyBottleneck`): one prior per *channel* (= per element of the
prior's batch shape, matched against the trailing dims of the input), shared
across all positions of a coding unit.

Usage, training (pure JAX; construct inside the jitted step)::

    em = ContinuousBatchedEntropyModel(prior, coding_rank=3)
    y_tilde, bits = em(y, rng=dither_key, training=True)

Usage, coding (outside jit; native range coder)::

    em = ContinuousBatchedEntropyModel(prior, coding_rank=3, compression=True)
    strings = em.compress(y)             # list of bytes, one per coding unit
    y_hat = em.decompress(strings, y.shape[1:-len(prior.batch_shape)])
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import host as codec
from compression_tpu.entropy_models.continuous_base import (
    ContinuousEntropyModelBase,
)

__all__ = ["ContinuousBatchedEntropyModel"]


class ContinuousBatchedEntropyModel(ContinuousEntropyModelBase):
    def __init__(self, prior, coding_rank: int, **kwargs):
        if coding_rank < len(prior.batch_shape):
            raise ValueError(
                f"coding_rank ({coding_rank}) must cover the prior batch "
                f"shape {prior.batch_shape}"
            )
        super().__init__(prior, coding_rank, **kwargs)

    def __call__(self, y, rng=None, training: bool = True):
        """Returns ``(y_tilde, bits)``; bits summed per coding unit.

        Args:
          y: ``(*batch, *coding_unit)`` with the prior's batch shape aligned
            to the trailing dims.
          rng: PRNG key for the additive-uniform dither (training only).
          training: additive noise if True, else straight-through rounding.
        """
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng key")
            y_tilde = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        else:
            y_tilde = self.quantize(y)
        log2_p = self._log2_prob(self.prior, y_tilde)
        bits = -jnp.sum(
            log2_p, axis=tuple(range(y.ndim - self.coding_rank, y.ndim))
        )
        return y_tilde, bits

    # -- coding ---------------------------------------------------------------

    def _flat_indexes(self, unit_shape: Tuple[int, ...]) -> np.ndarray:
        """Flat prior index for every element of one coding unit."""
        pshape = self.prior_batch_shape
        num = int(np.prod(pshape)) if pshape else 1
        idx = np.arange(num, dtype=np.int32).reshape(pshape if pshape else ())
        return np.ascontiguousarray(
            np.broadcast_to(idx, unit_shape).reshape(-1), np.int32
        )

    def _split_shapes(self, shape: Sequence[int]):
        shape = tuple(shape)
        batch = shape[: len(shape) - self.coding_rank]
        unit = shape[len(shape) - self.coding_rank :]
        pshape = self.prior_batch_shape
        if pshape and shape[len(shape) - len(pshape) :] != pshape:
            raise ValueError(
                f"Trailing dims of {shape} do not match prior batch shape {pshape}"
            )
        return batch, unit

    def compress(self, y) -> List[bytes]:
        """Encodes ``y``; one bitstream per leading-batch element.

        The device->host boundary: symbols are quantized on device (one tiny
        jitted op) and coded by the native library in one batched call.
        """
        tables = self._require_tables()
        _, unit = self._split_shapes(y.shape)
        offset = jnp.asarray(
            tables.offset.reshape(self.prior_batch_shape), y.dtype
        )
        symbols = jax.device_get(
            jnp.round(jnp.asarray(y) - offset).astype(jnp.int32)
        ).reshape((-1,) + unit)
        return self.compress_symbols(symbols)

    def symbol_offset(self, dtype=jnp.float32):
        """The quantization-grid offset, for computing symbols on device:
        ``symbols = round(y - offset)``; ``y_hat = symbols + offset``."""
        tables = self._require_tables()
        return jnp.asarray(
            tables.offset.reshape(self.prior_batch_shape), dtype
        )

    def compress_symbols(self, symbols: np.ndarray) -> List[bytes]:
        """Host-only fast path: code precomputed int32 symbols
        (``round(y - symbol_offset())``, already fetched to host)."""
        tables = self._require_tables()
        symbols = np.asarray(symbols, np.int32)
        _, unit = self._split_shapes(symbols.shape)
        symbols = symbols.reshape((-1,) + unit)
        indexes = self._flat_indexes(unit)
        n = symbols.shape[0]
        return codec.entropy_encode(
            symbols.reshape(n, -1),
            np.broadcast_to(indexes, (n, indexes.size)),
            tables.cdf,
            tables.cdf_length,
            tables.cdf_offset,
            tables.precision,
        )

    def decompress(self, strings: List[bytes], broadcast_shape: Sequence[int]):
        """Inverse of :meth:`compress`.

        ``broadcast_shape`` is the coding-unit shape *without* the prior batch
        dims (e.g. the latent's spatial dims).
        """
        tables = self._require_tables()
        unit = tuple(broadcast_shape) + self.prior_batch_shape
        indexes = self._flat_indexes(unit)
        n = len(strings)
        values = codec.entropy_decode(
            strings,
            np.broadcast_to(indexes, (n, indexes.size)),
            tables.cdf,
            tables.cdf_length,
            tables.cdf_offset,
            tables.precision,
        )
        offset = tables.offset.reshape(self.prior_batch_shape)
        y_hat = values.reshape((n,) + unit).astype(np.float32) + offset.astype(
            np.float32
        )
        return jnp.asarray(y_hat)
