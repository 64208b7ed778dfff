"""Grid-placement helpers: quantization offsets and tail quantiles.

Re-implementation of the reference helper protocol (reference:
tensorflow_compression/python/distributions/helpers.py:1-180):

  * ``quantization_offset(d)`` — where to center the integer quantization
    grid (the distribution's mode/median, reduced mod 1 so the grid is
    unchanged but the stored offset stays in [-1/2, 1/2]).
  * ``lower_tail(d, tail_mass)`` / ``upper_tail(d, tail_mass)`` — the points
    below/above which at most ``tail_mass / 2`` probability lies; the CDF
    tables are truncated there.
  * ``estimate_tails(func, target, shape)`` — numerical fallback root finder
    for distributions without analytic quantiles.

The reference's ``estimate_tails`` is an Adam-style gradient search inside a
``tf.while_loop``; here we use an expanding-bracket bisection in a
``lax.while_loop`` + ``lax.fori_loop`` — same contract (vectorized,
jit-compatible), deterministic convergence for the monotone functions it is
used with, and no gradient requirement on ``func``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "quantization_offset",
    "lower_tail",
    "upper_tail",
    "estimate_tails",
]


def estimate_tails(func: Callable, target, shape, dtype=jnp.float32):
    """Solves ``func(x) == target`` elementwise for monotone ``func``.

    Args:
      func: vectorized monotone function (increasing or decreasing; direction
        is detected automatically and may differ per element).
      target: scalar or array broadcastable to ``shape``.
      shape: batch shape of the search.
      dtype: dtype of the search variable.

    Returns:
      Array of shape ``shape`` with the (approximate) roots.
    """
    target = jnp.broadcast_to(jnp.asarray(target, dtype), shape)

    # Detect per-element monotonicity direction.
    probe = jnp.zeros(shape, dtype)
    increasing = func(probe + 1.0) >= func(probe - 1.0)

    # Expanding bracket: grow [lo, hi] geometrically until the target is
    # enclosed. Cap the expansion; 2^64 covers any practical prior support.
    # func values are carried in the loop state so each iteration evaluates
    # func only on the endpoints it moved (func may be a full MLP forward).
    def enclosed(f_lo, f_hi):
        lo_ok = jnp.where(increasing, f_lo <= target, f_lo >= target)
        hi_ok = jnp.where(increasing, f_hi >= target, f_hi <= target)
        return lo_ok & hi_ok

    def expand_cond(state):
        _lo, _hi, f_lo, f_hi, it = state
        return (it < 64) & ~jnp.all(enclosed(f_lo, f_hi))

    def expand_body(state):
        lo, hi, f_lo, f_hi, it = state
        ok = enclosed(f_lo, f_hi)
        width = jnp.maximum(hi - lo, 1.0)
        lo = jnp.where(ok, lo, lo - width)
        hi = jnp.where(ok, hi, hi + width)
        return lo, hi, func(lo), func(hi), it + 1

    lo = jnp.full(shape, -1.0, dtype)
    hi = jnp.full(shape, 1.0, dtype)
    lo, hi, _f_lo, _f_hi, _ = jax.lax.while_loop(
        expand_cond, expand_body, (lo, hi, func(lo), func(hi), 0)
    )

    # Bisection: 60 iterations → interval width ~ 2^-60 * initial.
    def bisect_body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        f_mid = func(mid)
        go_right = jnp.where(increasing, f_mid < target, f_mid > target)
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 60, bisect_body, (lo, hi))
    return 0.5 * (lo + hi)


def quantization_offset(distribution):
    """Offset (mod 1) to center the quantization grid on the prior's mode.

    Uses the distribution's analytic ``_quantization_offset`` when defined,
    else zero. The result is reduced modulo 1 (into [-1/2, 1/2]) — shifting
    the grid by integers does not change it, and a small stored offset keeps
    ``round(x - offset) + offset`` well-conditioned.
    """
    offset = distribution._quantization_offset()
    if offset is None:
        return jnp.zeros(distribution.batch_shape)
    offset = jnp.asarray(offset)
    return offset - jnp.round(offset)


def lower_tail(distribution, tail_mass: float):
    """Approximate quantile at ``tail_mass / 2``."""
    t = distribution._lower_tail(tail_mass)
    if t is not None:
        return jnp.asarray(t)
    lt = getattr(distribution, "log_cdf", None)
    if lt is None:  # pragma: no cover - protocol guarantees log_cdf
        raise TypeError("Distribution provides neither _lower_tail nor log_cdf.")
    target = jnp.log(jnp.asarray(tail_mass) / 2.0)
    return estimate_tails(
        distribution.log_cdf, target, distribution.batch_shape,
        _tail_dtype(distribution),
    )


def upper_tail(distribution, tail_mass: float):
    """Approximate quantile at ``1 - tail_mass / 2``."""
    t = distribution._upper_tail(tail_mass)
    if t is not None:
        return jnp.asarray(t)
    target = jnp.log(jnp.asarray(tail_mass) / 2.0)
    return estimate_tails(
        distribution.log_survival_function, target, distribution.batch_shape,
        _tail_dtype(distribution),
    )


def _tail_dtype(distribution):
    leaves = jax.tree_util.tree_leaves(distribution)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            return jnp.asarray(leaf).dtype
    return jnp.float32
