"""Rounding ops: straight-through round and the soft-round family.

TPU-native re-implementation of the reference round ops (reference:
tensorflow_compression/python/ops/round_ops.py:1-160; Agustsson & Theis 2020,
"Universally Quantized Neural Compression").

``soft_round`` is an invertible, differentiable relaxation of rounding::

    m = floor(x) + 1/2;  r = x - m
    soft_round(x, alpha) = m + tanh(alpha * r) / (2 * tanh(alpha / 2))

As ``alpha -> 0`` it approaches the identity; as ``alpha -> inf`` it sharpens
to hard rounding. Each interval [n - 1/2, n + 1/2] maps onto itself, so the
inverse is well defined.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "round_st",
    "soft_round",
    "soft_round_inverse",
    "soft_round_conditional_mean",
]

# Below this, tanh(alpha*r)/(2*tanh(alpha/2)) is numerically ~ r: use identity.
_ALPHA_EPS = 1e-3

# tanh saturates to +-1 well before |x| = 30; XLA's float64 CPU tanh returns
# NaN for huge arguments (observed: tanh(5000.) == nan), so clamp first.
_TANH_SAT = 30.0


def _tanh(x):
    return jnp.tanh(jnp.clip(x, -_TANH_SAT, _TANH_SAT))


def round_st(inputs, offset=None):
    """Straight-through rounding: forward = round, gradient = identity.

    With ``offset``, rounds ``inputs - offset`` and adds the offset back
    (quantization grid centered at ``offset`` mod 1).
    """
    if offset is not None:
        shifted = inputs - offset
        return inputs + jax.lax.stop_gradient(jnp.round(shifted) + offset - inputs)
    return inputs + jax.lax.stop_gradient(jnp.round(inputs) - inputs)


def soft_round(x, alpha):
    """Differentiable approximation to round (see module docstring)."""
    x = jnp.asarray(x)
    alpha = jnp.asarray(alpha, dtype=x.dtype)
    alpha_bounded = jnp.maximum(alpha, _ALPHA_EPS)
    m = jnp.floor(x) + 0.5
    r = x - m
    z = _tanh(alpha_bounded / 2.0) * 2.0
    y = m + _tanh(alpha_bounded * r) / z
    # For very small alpha fall back to identity (the limit) — avoids 0/0.
    return jnp.where(alpha < _ALPHA_EPS, x, y)


def soft_round_inverse(y, alpha):
    """Inverse of ``soft_round`` (maps each unit interval back onto itself)."""
    y = jnp.asarray(y)
    alpha = jnp.asarray(alpha, dtype=y.dtype)
    alpha_bounded = jnp.maximum(alpha, _ALPHA_EPS)
    m = jnp.floor(y) + 0.5
    s = (y - m) * (_tanh(alpha_bounded / 2.0) * 2.0)
    # Clip for numerical safety: s in (-1, 1) by construction, but float
    # rounding can push |s| to exactly 1 where atanh diverges.
    s = jnp.clip(s, -1.0 + 1e-7, 1.0 - 1e-7)
    r = jnp.arctanh(s) / alpha_bounded
    # Exact integers (y == m -+ 1/2) are fixed points; clip r to the interval.
    r = jnp.clip(r, -0.5, 0.5)
    return jnp.where(alpha < _ALPHA_EPS, y, m + r)


def soft_round_conditional_mean(y, alpha):
    """Conditional mean reconstruction E[X | soft_round(X + U) = y].

    Used decoder-side with soft-rounded universal quantization (Agustsson &
    Theis 2020, eq. 13): shifts the inverse by half a bin.
    """
    return soft_round_inverse(y - 0.5, alpha) + 0.5
