"""PMF -> quantized CDF in pure XLA int ops (jit/vmap-able).

SURVEY.md §2.1 (N3): the CDF quantization is data-parallel per PMF row, so
besides the authoritative C++ host implementation
(:func:`compression_tpu.codec.host.pmf_to_quantized_cdf`) this module
provides the same algorithm as a compiled JAX function — usable INSIDE a
jitted program (e.g. building per-input adaptive tables on device without a
host round-trip). Same greedy cross-entropy repair with first-index
tie-breaking; float64 throughout. The two implementations are cross-checked
row-for-row in tests/test_codec.py; for bitstream-compatibility-critical
table builds, the C++ one remains authoritative (on accelerators whose
float64 log differs from host libm in ulps, a tie can break differently).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["pmf_to_quantized_cdf_xla"]


@partial(jax.jit, static_argnames=("precision",))
def pmf_to_quantized_cdf_xla(pmf, pmf_lengths, precision: int):
    """Quantizes PMF rows to integer CDF rows (XLA; matches the C++ spec).

    Args:
      pmf: float ``[num_pmfs, max_len]`` (rows padded arbitrarily past
        their length).
      pmf_lengths: int32 ``[num_pmfs]`` valid row lengths.
      precision: CDF precision in bits (total mass ``2**precision``).

    Returns:
      int32 ``[num_pmfs, max_len + 1]`` CDF rows; entries past
      ``length + 1`` are zero (the C++ convention).
    """
    if not jax.config.jax_enable_x64:
        # Silent float32 degradation would take different rounding and
        # tie-break decisions than the float64 C++ quantizer — mismatched
        # CDF rows decode to garbage. Fail loudly instead.
        raise ValueError(
            "pmf_to_quantized_cdf_xla requires float64 "
            "(jax.config.update('jax_enable_x64', True)) to match the "
            "authoritative C++ quantizer bit-for-bit"
        )
    pmf = jnp.asarray(pmf, jnp.float64)
    if pmf.ndim == 1:
        pmf = pmf[None]
        pmf_lengths = jnp.atleast_1d(pmf_lengths)
    total = jnp.int64(1) << precision
    n = pmf.shape[1]

    def row(prob, length):
        idx = jnp.arange(n)
        valid = idx < length
        p = jnp.where(valid & jnp.isfinite(prob) & (prob > 0), prob, 0.0)
        s = jnp.sum(p)
        # All-zero/invalid rows fall back to uniform (C++ spec).
        p = jnp.where(s > 0, p, jnp.where(valid, 1.0, 0.0))
        s = jnp.sum(p)
        q = jnp.where(
            valid,
            jnp.maximum(1, jnp.round(p / s * total)).astype(jnp.int64),
            0,
        )

        def body(q):
            t = jnp.sum(q)
            qf = q.astype(jnp.float64)
            # Greedy cross-entropy repair: add mass where it helps most /
            # remove where it hurts least; first index wins ties (argmax /
            # argmin tie semantics match NumPy's).
            gain = jnp.where(valid, p * jnp.log((qf + 1.0) / qf), -jnp.inf)
            loss = jnp.where(
                valid & (q > 1),
                p * jnp.log(qf / jnp.maximum(qf - 1.0, 1e-300)),
                jnp.inf,
            )
            inc = t < total
            target = jnp.where(inc, jnp.argmax(gain), jnp.argmin(loss))
            return q.at[target].add(jnp.where(inc, 1, -1))

        q = jax.lax.while_loop(lambda q: jnp.sum(q) != total, body, q)
        cdf = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(q)])
        # Zero past length+1 (the C++ output-buffer convention).
        keep = jnp.arange(n + 1) <= length
        return jnp.where(keep, cdf, 0).astype(jnp.int32)

    return jax.vmap(row)(pmf, jnp.asarray(pmf_lengths, jnp.int32))
