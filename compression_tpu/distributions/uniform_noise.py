"""Uniform-noise adapters: the differentiable surrogate for quantization.

Re-implementation of the reference adapters (reference:
tensorflow_compression/python/distributions/uniform_noise.py:1-280;
Ballé et al. 2017, §3). ``UniformNoiseAdapter(base)`` is the distribution of
``Y = X + U`` with ``U ~ Uniform(-1/2, 1/2)``::

    p_Y(y) = c_X(y + 1/2) - c_X(y - 1/2)

evaluated in log space with the big-minus-small trick: on the left tail the
difference of CDFs is accurate, on the right tail the difference of survival
functions is — the branch is chosen per element.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from compression_tpu.distributions.base import (
    Distribution,
    register_distribution_pytree,
)
from compression_tpu.distributions.deep_factorized import DeepFactorized
from compression_tpu.distributions.scalar import Logistic, MixtureSameFamily, Normal

__all__ = [
    "UniformNoiseAdapter",
    "NoisyNormal",
    "NoisyLogistic",
    "NoisyDeepFactorized",
    "NoisyNormalMixture",
    "NoisyLogisticMixture",
    "NoisyMixtureSameFamily",
]


def _log_diff_exp(big, small):
    """log(exp(big) - exp(small)), stable for big >= small.

    The difference is floored (relative ~1e-12) so the log never hits -inf;
    this is the gradient-safety floor the reference gets from
    ``laplace_tail_mass`` — deep tails keep a tiny, finite density.
    """
    diff = jnp.minimum(small - big, -1e-12)
    return big + jnp.log(-jnp.expm1(diff))


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class UniformNoiseAdapter(Distribution):
    """Density of ``base + Uniform(-1/2, 1/2)``."""

    base: Distribution

    @property
    def batch_shape(self):
        return self.base.batch_shape

    def log_prob(self, y):
        y = jnp.asarray(y)
        logcdf_p = self.base.log_cdf(y + 0.5)
        logcdf_m = self.base.log_cdf(y - 0.5)
        logsf_p = self.base.log_survival_function(y + 0.5)
        logsf_m = self.base.log_survival_function(y - 0.5)
        # Left of the median the CDFs are small (accurate); right of it the
        # survival functions are. Pick per element.
        use_cdf = logcdf_p + logcdf_m < logsf_p + logsf_m
        left = _log_diff_exp(logcdf_p, logcdf_m)
        right = _log_diff_exp(logsf_m, logsf_p)
        return jnp.where(use_cdf, left, right)

    def prob(self, y):
        return jnp.exp(self.log_prob(y))

    def cdf(self, y):
        # CDF of Y is the base CDF smoothed over the unit bin; we rarely need
        # it, so integrate with the midpoint identity: exact for the mixture
        # of shifts is int_{y-1/2}^{y+1/2} c_X — approximate by c_X(y).
        return self.base.cdf(y)

    def log_cdf(self, y):
        return self.base.log_cdf(y)

    def log_survival_function(self, y):
        return self.base.log_survival_function(y)

    # grid protocol: delegate to the base distribution (the reference builds
    # its CDF tables from the base prior's tails as well).
    def _grid_points(self, tail_mass):
        fn = getattr(self.base, "_grid_points", None)
        return fn(tail_mass) if fn is not None else None

    def _quantization_offset(self):
        return self.base._quantization_offset()

    def _lower_tail(self, tail_mass):
        return self.base._lower_tail(tail_mass)

    def _upper_tail(self, tail_mass):
        return self.base._upper_tail(tail_mass)


# Convenience constructors mirroring the reference class names.
def NoisyNormal(loc, scale):
    """Gaussian + U(-1/2, 1/2) (reference: uniform_noise.NoisyNormal)."""
    return UniformNoiseAdapter(Normal(jnp.asarray(loc), jnp.asarray(scale)))


def NoisyLogistic(loc, scale):
    """Logistic + U(-1/2, 1/2)."""
    return UniformNoiseAdapter(Logistic(jnp.asarray(loc), jnp.asarray(scale)))


def NoisyDeepFactorized(**kwargs):
    """DeepFactorized + U(-1/2, 1/2). kwargs forwarded to DeepFactorized.create."""
    return UniformNoiseAdapter(DeepFactorized.create(**kwargs))


def NoisyMixtureSameFamily(logits, components):
    """Mixture + U(-1/2, 1/2): additive noise commutes with mixing."""
    return UniformNoiseAdapter(MixtureSameFamily(jnp.asarray(logits), components))


def NoisyNormalMixture(logits, loc, scale):
    return NoisyMixtureSameFamily(logits, Normal(jnp.asarray(loc), jnp.asarray(scale)))


def NoisyLogisticMixture(logits, loc, scale):
    return NoisyMixtureSameFamily(
        logits, Logistic(jnp.asarray(loc), jnp.asarray(scale))
    )
