"""Entropy model base: the train/test bridge (rate estimate <-> range coder).

TPU-native re-design of the reference base class (reference:
tensorflow_compression/python/entropy_models/continuous_base.py:40-600).

Design differences from the reference, deliberate and TPU-first:

* Entropy models are **lightweight immutable objects** built around a prior
  (an immutable pytree from :mod:`compression_tpu.distributions`). The
  training path (`__call__`) is pure JAX — construct the model *inside* the
  jitted train step around the traced prior, it costs nothing. The coding
  path (`compress`/`decompress`) runs outside `jit`: symbols are computed on
  device with a tiny jitted kernel, fetched, and handed to the native C++
  coder in one batched, multi-threaded call (see
  :mod:`compression_tpu.codec.host`) — the host/device pipeline overlap
  lives in :mod:`compression_tpu.parallel.pipeline`.

* CDF tables are built **once, host-side, in float64** (``CdfTables``,
  plain NumPy) when ``compression=True`` — never inside a compiled graph.
  Float64 + a C++ quantizer makes the integer tables reproducible across
  backends, which is what bitstream determinism rests on (SURVEY.md §3.5).

Table-build algorithm (matches the reference contract,
continuous_base.py:≈300):

1. ``offset = quantization_offset(prior)`` (mode-centering, mod 1).
2. ``lo = lower_tail(prior, tail_mass)``, ``hi = upper_tail(...)``:
   the grid per prior element is the integer span covering [lo, hi].
3. PMF: the prior's (noise-convolved) density evaluated at the grid points.
4. Leftover probability mass becomes the **escape symbol** (last symbol of
   each row); out-of-range values are escaped and Elias-gamma coded by the
   native coder, so any integer round-trips losslessly.
5. ``pmf_to_quantized_cdf`` (C++) turns each padded row into integer CDFs
   at ``range_coder_precision`` bits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import host as codec
from compression_tpu.distributions import helpers

__all__ = ["CdfTables", "ContinuousEntropyModelBase"]


@dataclasses.dataclass(frozen=True)
class CdfTables:
    """Integer range-coder tables (host-side NumPy; the codec's only input).

    Rows are ragged: row i has ``cdf_length[i]`` valid entries =
    ``num_grid_points_i + 2`` (escape symbol + terminator).
    ``cdf_offset[i]`` is the integer value of grid point 0;
    ``offset[i]`` the fractional quantization offset.
    """

    cdf: np.ndarray          # int32 [num_cdfs, max_len]
    cdf_length: np.ndarray   # int32 [num_cdfs]
    cdf_offset: np.ndarray   # int32 [num_cdfs]
    offset: np.ndarray       # float64, prior batch shape (flattened per row)
    precision: int

    @property
    def num_cdfs(self) -> int:
        return self.cdf.shape[0]


def save_tables(path: str, tables: dict) -> None:
    """Saves a dict of named CdfTables to one .npz (atomic rename)."""
    import os

    arrays = {}
    for name, t in tables.items():
        arrays[f"{name}.cdf"] = t.cdf
        arrays[f"{name}.cdf_length"] = t.cdf_length
        arrays[f"{name}.cdf_offset"] = t.cdf_offset
        arrays[f"{name}.offset"] = t.offset
        arrays[f"{name}.precision"] = np.asarray(t.precision)
    tmp = f"{path}.tmp{os.getpid()}"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_tables(path: str) -> dict:
    """Inverse of :func:`save_tables`."""
    data = np.load(path)
    names = sorted({k.split(".")[0] for k in data.files})
    out = {}
    for name in names:
        out[name] = CdfTables(
            cdf=data[f"{name}.cdf"],
            cdf_length=data[f"{name}.cdf_length"],
            cdf_offset=data[f"{name}.cdf_offset"],
            offset=data[f"{name}.offset"],
            precision=int(data[f"{name}.precision"]),
        )
    return out


class ContinuousEntropyModelBase:
    """Shared machinery for the continuous entropy models.

    Args:
      prior: distribution pytree; its batch shape is the per-element prior
        layout (e.g. one prior per latent channel).
      coding_rank: number of trailing dimensions of an input treated as one
        coding unit (one bit count / one bitstream each).
      compression: build the range-coder tables now (host-side).
      tail_mass: probability mass allowed outside the tabulated range.
      range_coder_precision: CDF precision in bits.
      laplace_tail_mass: if > 0, the training likelihood is mixed with a
        Laplace(0, 1) floor so rate gradients never vanish in dead zones.
      offset_heuristic: center quantization grids on the prior's mode.
    """

    def __init__(
        self,
        prior,
        coding_rank: int,
        *,
        compression: bool = False,
        tail_mass: float = 2.0 ** -8,
        range_coder_precision: int = 12,
        laplace_tail_mass: float = 0.0,
        offset_heuristic: bool = True,
        tables: Optional[CdfTables] = None,
    ):
        self.prior = prior
        self.coding_rank = int(coding_rank)
        self.tail_mass = float(tail_mass)
        self.range_coder_precision = int(range_coder_precision)
        self.laplace_tail_mass = float(laplace_tail_mass)
        self.offset_heuristic = bool(offset_heuristic)
        self.tables: Optional[CdfTables] = tables
        if compression and self.tables is None:
            self.tables = self.build_tables()

    # -- training-side helpers ----------------------------------------------

    @property
    def prior_batch_shape(self) -> Tuple[int, ...]:
        return tuple(self.prior.batch_shape)

    def quantization_offset(self):
        if not self.offset_heuristic:
            return jnp.zeros(self.prior_batch_shape)
        return helpers.quantization_offset(self.prior)

    def quantize(self, y, offset=None):
        """Round to the offset grid with straight-through gradients.

        The heuristic grid offset is a non-differentiable placement
        decision (and its root-finder runs in a `lax.while_loop`, which has
        no reverse-mode), so it is stop-gradient'd — gradients flow through
        the straight-through round only. Usable inside training steps
        (mixed-quantization recipes)."""
        if offset is None:
            offset = jax.lax.stop_gradient(self.quantization_offset())
        from compression_tpu.ops.round_ops import round_st

        return round_st(y, offset)

    def _log2_prob(self, prior, y):
        """Training likelihood in bits, with the optional Laplace mix."""
        log_p = prior.log_prob(y)
        if self.laplace_tail_mass > 0.0:
            m = self.laplace_tail_mass
            # Laplace(0, 1) density as a gradient-carrying floor.
            laplace_log = -jnp.abs(y) - jnp.log(2.0)
            log_p = jnp.logaddexp(
                log_p + jnp.log1p(-m), laplace_log + jnp.log(m)
            )
        return log_p / jnp.log(2.0)

    # -- table build (host side) --------------------------------------------

    def _table_offsets(self, prior) -> np.ndarray:
        """Fractional grid offsets per CDF row (overridden by universal EMs)."""
        return np.asarray(
            jax.device_get(
                helpers.quantization_offset(prior)
                if self.offset_heuristic
                else jnp.zeros(prior.batch_shape)
            ),
            np.float64,
        ).reshape(-1)

    @staticmethod
    def _host_cpu():
        """Table building is one-time host work: pin it to the CPU backend so
        it never pays accelerator-compile latency (notably over tunneled
        TPUs) and stays reproducible across accelerator generations."""
        import contextlib

        try:
            return jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            return contextlib.nullcontext()

    def build_tables(self, prior=None) -> CdfTables:
        """Builds integer CDF tables from the (concrete) prior, in float64."""
        prior = self.prior if prior is None else prior
        # default_device alone is not enough: computations follow their
        # operands, and the prior's arrays usually live on the accelerator.
        # Move them to host CPU first so the tail search / PMF evaluation
        # compiles and runs locally (the accelerator-side compile of the
        # root-finder loop costs minutes over a tunneled TPU).
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            prior = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, cpu), prior
            )
        except RuntimeError:
            pass
        with self._host_cpu():
            return self._build_tables_impl(prior)

    def _build_tables_impl(self, prior) -> CdfTables:
        # Fast path: priors exposing _grid_points solve offset + both tails
        # in one compiled root-find (DeepFactorized); fall back to the three
        # separate helper searches otherwise.
        offsets_overridden = (
            type(self)._table_offsets
            is not ContinuousEntropyModelBase._table_offsets
        )
        grid_fn = getattr(prior, "_grid_points", None)
        # Only run the fused solve when its result is actually usable.
        pts = (
            grid_fn(self.tail_mass)
            if grid_fn is not None
            and self.offset_heuristic
            and not offsets_overridden
            else None
        )
        if pts is not None:
            off_raw, lo_raw, hi_raw = jax.device_get(pts)
            offset = np.asarray(off_raw, np.float64).reshape(-1)
            offset -= np.round(offset)
            lo = np.asarray(lo_raw, np.float64).reshape(-1)
            hi = np.asarray(hi_raw, np.float64).reshape(-1)
        else:
            offset = self._table_offsets(prior)
            lo = np.asarray(
                jax.device_get(helpers.lower_tail(prior, self.tail_mass)),
                np.float64,
            ).reshape(-1)
            hi = np.asarray(
                jax.device_get(helpers.upper_tail(prior, self.tail_mass)),
                np.float64,
            ).reshape(-1)

        minima = np.floor(lo - offset).astype(np.int64)
        maxima = np.ceil(hi - offset).astype(np.int64)
        lengths = (maxima - minima + 1).astype(np.int64)
        max_len = int(lengths.max()) if lengths.size else 1
        num = offset.size

        # PMF on the integer grid (vectorized across rows; one prior eval).
        grid = minima[:, None] + np.arange(max_len)[None, :]  # [num, max_len]
        x = jnp.asarray((grid + offset[:, None]).reshape(num, max_len))
        # prior batch shape broadcast: evaluate each row's scalar prior on its
        # own grid — move the grid axis first so it broadcasts against the
        # prior's batch shape.
        xx = jnp.moveaxis(x.reshape((num, max_len)), 1, 0).reshape(
            (max_len,) + tuple(prior.batch_shape)
        )
        pmf = jax.device_get(prior.prob(xx))
        pmf = np.moveaxis(
            np.asarray(pmf, np.float64).reshape(max_len, num), 0, 1
        )
        # Mask out-of-row entries; fold leftover mass into the escape symbol.
        valid = np.arange(max_len)[None, :] < lengths[:, None]
        pmf = np.where(valid, pmf, 0.0)
        pmf = np.clip(pmf, 0.0, None)
        escape = np.clip(1.0 - pmf.sum(axis=1), 2.0 ** -20, 1.0)

        # Padded rows: [pmf_0 .. pmf_{L-1}, escape]; row length L + 1 symbols.
        padded = np.zeros((num, max_len + 1), np.float64)
        padded[:, :max_len] = pmf
        padded[np.arange(num), lengths] = escape
        sym_lengths = (lengths + 1).astype(np.int32)

        cdf = codec.pmf_to_quantized_cdf(
            padded, sym_lengths, self.range_coder_precision
        )
        return CdfTables(
            cdf=cdf.astype(np.int32),
            cdf_length=(sym_lengths + 1).astype(np.int32),
            cdf_offset=minima.astype(np.int32),
            offset=offset,
            precision=self.range_coder_precision,
        )

    def _require_tables(self) -> CdfTables:
        if self.tables is None:
            raise RuntimeError(
                "This entropy model was built with compression=False; "
                "pass compression=True (or call build_tables) before "
                "compress/decompress."
            )
        return self.tables
