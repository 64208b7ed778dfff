"""Round / soft-round distribution adapters (Agustsson & Theis 2020).

Re-implementation of the reference round adapters (reference:
tensorflow_compression/python/distributions/round_adapters.py:1-300).

``MonotonicAdapter`` transforms a base distribution through a monotone map
``t``: the CDF of ``Y = t(X)`` is ``c_X(t^{-1}(y))``. These adapters are
meant to be wrapped in :class:`UniformNoiseAdapter` (which only consumes
CDF-level quantities), giving the training densities of soft-rounded
universal quantization.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from compression_tpu.distributions.base import (
    Distribution,
    register_distribution_pytree,
)
from compression_tpu.distributions.deep_factorized import DeepFactorized
from compression_tpu.distributions.scalar import Normal
from compression_tpu.distributions.uniform_noise import UniformNoiseAdapter
from compression_tpu.ops.round_ops import soft_round, soft_round_inverse

__all__ = [
    "MonotonicAdapter",
    "RoundAdapter",
    "SoftRoundAdapter",
    "NoisyRoundAdapter",
    "NoisySoftRoundAdapter",
    "NoisyRoundedNormal",
    "NoisyRoundedDeepFactorized",
    "NoisySoftRoundedNormal",
    "NoisySoftRoundedDeepFactorized",
]


@dataclasses.dataclass(frozen=True)
class MonotonicAdapter(Distribution):
    """Distribution of ``t(X)`` for a monotone increasing transform ``t``."""

    base: Distribution

    def transform(self, x):
        raise NotImplementedError

    def inverse_transform(self, y):
        raise NotImplementedError

    @property
    def batch_shape(self):
        return self.base.batch_shape

    def cdf(self, y):
        return self.base.cdf(self.inverse_transform(y))

    def log_cdf(self, y):
        return self.base.log_cdf(self.inverse_transform(y))

    def survival_function(self, y):
        return self.base.survival_function(self.inverse_transform(y))

    def log_survival_function(self, y):
        return self.base.log_survival_function(self.inverse_transform(y))

    def log_prob(self, y):  # pragma: no cover - not defined for hard round
        raise NotImplementedError(
            "Wrap in UniformNoiseAdapter for a proper density."
        )

    # grid protocol: transform the base's grid.
    def _quantization_offset(self):
        off = self.base._quantization_offset()
        return None if off is None else self.transform(jnp.asarray(off))

    def _lower_tail(self, tail_mass):
        t = self.base._lower_tail(tail_mass)
        return None if t is None else self.transform(jnp.asarray(t))

    def _upper_tail(self, tail_mass):
        t = self.base._upper_tail(tail_mass)
        return None if t is None else self.transform(jnp.asarray(t))


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class RoundAdapter(MonotonicAdapter):
    """Hard rounding: Y = round(X). CDF is the exact staircase."""

    def transform(self, x):
        return jnp.round(x)

    def inverse_transform(self, y):
        # P(round(X) <= y) = c_X(floor(y) + 1/2), exact for all real y.
        return jnp.floor(y) + 0.5


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class SoftRoundAdapter(MonotonicAdapter):
    """Soft rounding: Y = soft_round(X, alpha) — smooth and invertible."""

    alpha: jnp.ndarray = 5.0

    def transform(self, x):
        return soft_round(x, self.alpha)

    def inverse_transform(self, y):
        return soft_round_inverse(y, self.alpha)


def NoisyRoundAdapter(base):
    return UniformNoiseAdapter(RoundAdapter(base))


def NoisySoftRoundAdapter(base, alpha=5.0):
    return UniformNoiseAdapter(SoftRoundAdapter(base, jnp.asarray(alpha)))


def NoisyRoundedNormal(loc, scale):
    return NoisyRoundAdapter(Normal(jnp.asarray(loc), jnp.asarray(scale)))


def NoisyRoundedDeepFactorized(**kwargs):
    return NoisyRoundAdapter(DeepFactorized.create(**kwargs))


def NoisySoftRoundedNormal(loc, scale, alpha=5.0):
    return NoisySoftRoundAdapter(
        Normal(jnp.asarray(loc), jnp.asarray(scale)), alpha=alpha
    )


def NoisySoftRoundedDeepFactorized(alpha=5.0, **kwargs):
    return NoisySoftRoundAdapter(DeepFactorized.create(**kwargs), alpha=alpha)
