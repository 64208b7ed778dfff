"""Indexed entropy models (the reference's GaussianConditional role).

Re-design of ContinuousIndexedEntropyModel / LocationScaleIndexedEntropyModel
(reference: tensorflow_compression/python/entropy_models/
continuous_indexed.py:30-520): the prior's parameters are *functions of an
integer index tensor*; one CDF row is tabulated per index combination, and
each element is coded against its own row. This is how hyperprior models
code `y` — the hyper-synthesis predicts a scale (and mean), the scale is
quantized onto a log-spaced table, and the table index selects the CDF.

Training keeps gradients flowing into the index-producing network: indexes
stay *continuous* in `__call__` (clipped with identity-if-towards bounds,
reference continuous_indexed.py `_normalize_indexes`); only the coding path
rounds them.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import host as codec
from compression_tpu.entropy_models.continuous_base import (
    ContinuousEntropyModelBase,
)
from compression_tpu.ops.math_ops import lower_bound, upper_bound
from compression_tpu.ops.round_ops import round_st

__all__ = [
    "ContinuousIndexedEntropyModel",
    "LocationScaleIndexedEntropyModel",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
    "log_scale_fn",
    "inverse_log_scale_fn",
]

# The standard log-spaced scale table (reference: models/bmshj2018.py:≈40).
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def log_scale_fn(i, scales_min=SCALES_MIN, scales_max=SCALES_MAX,
                 levels=SCALES_LEVELS):
    """index -> scale on the log-linear grid."""
    step = (math.log(scales_max) - math.log(scales_min)) / (levels - 1)
    return jnp.exp(math.log(scales_min) + step * i)


def inverse_log_scale_fn(scale, scales_min=SCALES_MIN, scales_max=SCALES_MAX,
                         levels=SCALES_LEVELS):
    """scale -> continuous index on the log-linear grid."""
    step = (math.log(scales_max) - math.log(scales_min)) / (levels - 1)
    return (jnp.log(scale) - math.log(scales_min)) / step


class ContinuousIndexedEntropyModel(ContinuousEntropyModelBase):
    """Entropy model whose prior parameters are functions of an index tensor.

    Args:
      prior_fn: callable(**params) -> Distribution.
      index_ranges: number of levels per index dimension. With one entry,
        ``indexes`` has the same shape as the input; with ``k`` entries it
        has a trailing length-``k`` dimension.
      parameter_fns: dict of parameter name -> fn(indexes) (vectorized,
        differentiable; evaluated on continuous indexes during training and
        on the integer grid for table building).
      coding_rank: trailing dims forming one coding unit.
    """

    def __init__(
        self,
        prior_fn: Callable,
        index_ranges: Sequence[int],
        parameter_fns: Dict[str, Callable],
        coding_rank: int,
        *,
        compression: bool = False,
        tail_mass: float = 2.0 ** -8,
        range_coder_precision: int = 12,
        laplace_tail_mass: float = 0.0,
        tables=None,
    ):
        self.prior_fn = prior_fn
        self.index_ranges = tuple(int(r) for r in index_ranges)
        self.parameter_fns = dict(parameter_fns)
        # The full-grid prior (batch shape = index_ranges) backs table
        # building and shape checks.
        grid = jnp.stack(
            jnp.meshgrid(
                *[jnp.arange(r, dtype=jnp.float32) for r in self.index_ranges],
                indexing="ij",
            ),
            axis=-1,
        )
        grid_prior = self._make_prior(jnp.squeeze(grid, -1) if len(self.index_ranges) == 1 else grid)
        super().__init__(
            grid_prior,
            coding_rank,
            compression=False,
            tail_mass=tail_mass,
            range_coder_precision=range_coder_precision,
            laplace_tail_mass=laplace_tail_mass,
            offset_heuristic=False,
        )
        # coding_rank semantics differ from the batched model: the prior here
        # is per-element, so no trailing-shape match is required.
        if tables is not None:
            self.tables = tables
        elif compression:
            self.tables = self.build_tables()

    # -- prior construction ---------------------------------------------------

    def _make_prior(self, indexes):
        params = {k: fn(indexes) for k, fn in self.parameter_fns.items()}
        return self.prior_fn(**params)

    def _normalize_indexes(self, indexes):
        """Differentiably clips continuous indexes into the declared ranges."""
        indexes = jnp.asarray(indexes)
        if len(self.index_ranges) == 1:
            lo, hi = 0.0, self.index_ranges[0] - 1
            return upper_bound(lower_bound(indexes, lo), hi)
        bounded = []
        for d, r in enumerate(self.index_ranges):
            bounded.append(
                upper_bound(lower_bound(indexes[..., d], 0.0), r - 1)
            )
        return jnp.stack(bounded, axis=-1)

    def _flat_int_indexes(self, indexes) -> np.ndarray:
        """Rounds normalized indexes and flattens multi-dim index combos."""
        idx = np.asarray(jax.device_get(jnp.round(self._normalize_indexes(indexes)))).astype(np.int64)
        if len(self.index_ranges) == 1:
            return idx.astype(np.int32)
        flat = np.ravel_multi_index(
            tuple(idx[..., d] for d in range(idx.shape[-1])), self.index_ranges
        )
        return flat.astype(np.int32)

    # -- training -------------------------------------------------------------

    def __call__(self, y, indexes, rng=None, training: bool = True):
        """Returns ``(y_tilde, bits)``; bits summed over coding_rank dims."""
        indexes = self._normalize_indexes(indexes)
        prior = self._make_prior(indexes)
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng key")
            y_tilde = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        else:
            y_tilde = round_st(y)
        log2_p = self._log2_prob(prior, y_tilde)
        bits = -jnp.sum(
            log2_p, axis=tuple(range(y.ndim - self.coding_rank, y.ndim))
        )
        return y_tilde, bits

    # -- coding ---------------------------------------------------------------

    def _batch_split(self, shape: Sequence[int]) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        shape = tuple(shape)
        return shape[: len(shape) - self.coding_rank], shape[len(shape) - self.coding_rank :]

    def compress(self, y, indexes) -> List[bytes]:
        batch, _ = self._batch_split(jnp.shape(y))
        n = int(np.prod(batch)) if batch else 1
        symbols = np.asarray(
            jax.device_get(jnp.round(jnp.asarray(y)).astype(jnp.int32))
        ).reshape(n, -1)
        flat_idx = self._flat_int_indexes(indexes).reshape(n, -1)
        return self.compress_symbols(symbols, flat_idx)

    def device_indexes(self, indexes):
        """Rounds+flattens continuous indexes on device (int32), matching
        `_flat_int_indexes` — compute this inside a jitted encoder and ship
        int32 to the host instead of float parameter fields."""
        idx = jnp.round(self._normalize_indexes(indexes)).astype(jnp.int32)
        if len(self.index_ranges) == 1:
            return idx
        strides = np.cumprod((self.index_ranges + (1,))[::-1])[::-1][1:]
        return jnp.sum(
            idx * jnp.asarray(strides, jnp.int32), axis=-1
        ).astype(jnp.int32)

    def compress_symbols(self, symbols: np.ndarray, flat_indexes: np.ndarray) -> List[bytes]:
        """Host-only fast path over precomputed int32 symbols + flat CDF rows."""
        tables = self._require_tables()
        symbols = np.asarray(symbols, np.int32)
        n = symbols.shape[0] if symbols.ndim > 1 else 1
        return codec.entropy_encode(
            symbols.reshape(n, -1),
            np.asarray(flat_indexes, np.int32).reshape(n, -1),
            tables.cdf, tables.cdf_length,
            tables.cdf_offset, tables.precision,
        )

    def decompress(self, strings: List[bytes], indexes):
        flat_idx = self._flat_int_indexes(indexes)
        return self.decompress_rows(strings, flat_idx, flat_idx.shape)

    def decode_symbols(self, strings: List[bytes], flat_rows) -> np.ndarray:
        """Host-only decode to raw int32 values against precomputed rows."""
        tables = self._require_tables()
        flat_rows = np.asarray(flat_rows, np.int32)
        n = len(strings)
        return codec.entropy_decode(
            strings, flat_rows.reshape(n, -1), tables.cdf, tables.cdf_length,
            tables.cdf_offset, tables.precision,
        )

    def decompress_rows(self, strings: List[bytes], flat_rows, shape):
        """Decode against precomputed int32 CDF rows (the deterministic
        path: encoder and decoder must derive rows with the SAME compiled
        function, or float ulp differences can desynchronize the coder)."""
        values = self.decode_symbols(strings, flat_rows)
        return jnp.asarray(values.reshape(shape).astype(np.float32))


class LocationScaleIndexedEntropyModel:
    """Location-scale convenience wrapper (reference: the class used by all
    hyperprior codecs, continuous_indexed.py:≈400): the mean is subtracted
    before coding and added back after decoding, so a single scale-indexed
    table family serves any predicted (mu, sigma).

    ``scale_fn`` / ``inverse_scale_fn`` default to the standard log-spaced
    table (SCALES_MIN/MAX/LEVELS).
    """

    def __init__(
        self,
        prior_fn: Callable,
        num_scales: int = SCALES_LEVELS,
        scale_fn: Callable = None,
        inverse_scale_fn: Callable = None,
        coding_rank: int = 1,
        *,
        scales_min: float = SCALES_MIN,
        scales_max: float = SCALES_MAX,
        compression: bool = False,
        tail_mass: float = 2.0 ** -8,
        range_coder_precision: int = 12,
        laplace_tail_mass: float = 0.0,
        tables=None,
    ):
        if scale_fn is None:
            scale_fn = lambda i: log_scale_fn(i, scales_min, scales_max, num_scales)  # noqa: E731
        if inverse_scale_fn is None:
            inverse_scale_fn = lambda s: inverse_log_scale_fn(  # noqa: E731
                s, scales_min, scales_max, num_scales
            )
        self.scale_fn = scale_fn
        self.inverse_scale_fn = inverse_scale_fn
        self._rows_jit = None
        self._em = ContinuousIndexedEntropyModel(
            prior_fn=lambda scale: prior_fn(
                loc=jnp.zeros_like(scale), scale=scale
            ),
            index_ranges=(num_scales,),
            parameter_fns={"scale": scale_fn},
            coding_rank=coding_rank,
            compression=compression,
            tail_mass=tail_mass,
            range_coder_precision=range_coder_precision,
            laplace_tail_mass=laplace_tail_mass,
            tables=tables,
        )

    @property
    def tables(self):
        return self._em.tables

    def __call__(self, y, scale, loc=None, rng=None, training: bool = True):
        indexes = self.inverse_scale_fn(scale)
        center = y if loc is None else y - loc
        y_tilde, bits = self._em(center, indexes, rng=rng, training=training)
        if loc is not None:
            y_tilde = y_tilde + loc
        return y_tilde, bits

    def quantize(self, y, loc=None):
        if loc is None:
            return round_st(y)
        return round_st(y - loc) + loc

    def device_symbols(self, y, scale, loc=None):
        """Device-side (jit-friendly) symbol + CDF-row computation:
        returns int32 (symbols, flat_indexes) for `compress_symbols`."""
        center = y if loc is None else y - loc
        symbols = jnp.round(center).astype(jnp.int32)
        return symbols, self._em.device_indexes(self.inverse_scale_fn(scale))

    def rows(self, scale):
        """Canonical scale->CDF-row function, jitted ONCE and shared by the
        encode and decode paths — bit-equal scales then always map to the
        same rows regardless of how the caller's surrounding code compiled.
        Rows are returned in the narrowest dtype that holds the table size
        (uint8 for the standard 64-level table: 4x less host traffic)."""
        if self._rows_jit is None:
            levels = self._em.index_ranges[0]
            out_dtype = (
                jnp.uint8 if levels <= 256
                else jnp.uint16 if levels <= 65536
                else jnp.int32
            )
            self._rows_jit = jax.jit(
                lambda s: self._em.device_indexes(
                    self.inverse_scale_fn(s)
                ).astype(out_dtype)
            )
        return self._rows_jit(scale)

    def compress_symbols(self, symbols, flat_indexes) -> List[bytes]:
        return self._em.compress_symbols(symbols, flat_indexes)

    def decode_symbols(self, strings, flat_rows):
        return self._em.decode_symbols(strings, flat_rows)

    def decompress_rows(self, strings, flat_rows, shape, loc=None):
        values = self._em.decompress_rows(strings, flat_rows, shape)
        return values if loc is None else values + loc

    def compress(self, y, scale, loc=None) -> List[bytes]:
        center = y if loc is None else y - loc
        return self._em.compress(center, self.inverse_scale_fn(scale))

    def decompress(self, strings, scale, loc=None):
        values = self._em.decompress(strings, self.inverse_scale_fn(scale))
        if loc is not None:
            values = values + loc
        return values
