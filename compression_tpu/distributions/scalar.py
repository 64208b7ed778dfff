"""Analytic scalar distributions: Normal, Logistic, and mixtures.

The reference uses tensorflow_probability for these (reference:
tensorflow_compression/python/distributions/uniform_noise.py:1-280 wraps
tfp.distributions.Normal / Logistic / MixtureSameFamily). Here they are
small immutable pytrees with exactly the protocol entropy models need:
stable ``log_cdf`` / ``log_survival_function`` and analytic tails.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp_special

from compression_tpu.distributions.base import (
    Distribution,
    register_distribution_pytree,
)

__all__ = ["Normal", "Logistic", "MixtureSameFamily"]

_LOG_2 = 0.6931471805599453


def _ndtri(p):
    return jsp_special.ndtri(p)


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class Normal(Distribution):
    """Gaussian with location ``loc`` and scale ``scale`` (broadcastable)."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def _z(self, x):
        return (x - self.loc) / self.scale

    def log_prob(self, x):
        z = self._z(x)
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi).astype(
            jnp.result_type(z)
        )

    def cdf(self, x):
        return jsp_special.ndtr(self._z(x))

    def log_cdf(self, x):
        return jsp_special.log_ndtr(self._z(x))

    def survival_function(self, x):
        return jsp_special.ndtr(-self._z(x))

    def log_survival_function(self, x):
        return jsp_special.log_ndtr(-self._z(x))

    def quantile(self, p):
        return self.loc + self.scale * _ndtri(jnp.asarray(p))

    # grid protocol -----------------------------------------------------
    def _quantization_offset(self):
        return self.loc

    def _lower_tail(self, tail_mass):
        return self.quantile(tail_mass / 2.0)

    def _upper_tail(self, tail_mass):
        return self.loc - self.scale * _ndtri(jnp.asarray(tail_mass) / 2.0)


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class Logistic(Distribution):
    """Logistic distribution with location ``loc`` and scale ``scale``."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    def _z(self, x):
        return (x - self.loc) / self.scale

    def log_prob(self, x):
        z = self._z(x)
        # log pdf = -z - 2*softplus(-z) - log(scale)
        return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(self.scale)

    def cdf(self, x):
        return jax.nn.sigmoid(self._z(x))

    def log_cdf(self, x):
        return jax.nn.log_sigmoid(self._z(x))

    def survival_function(self, x):
        return jax.nn.sigmoid(-self._z(x))

    def log_survival_function(self, x):
        return jax.nn.log_sigmoid(-self._z(x))

    def quantile(self, p):
        p = jnp.asarray(p)
        return self.loc + self.scale * (jnp.log(p) - jnp.log1p(-p))

    # grid protocol -----------------------------------------------------
    def _quantization_offset(self):
        return self.loc

    def _lower_tail(self, tail_mass):
        return self.quantile(jnp.asarray(tail_mass) / 2.0)

    def _upper_tail(self, tail_mass):
        t = jnp.asarray(tail_mass) / 2.0
        return self.loc - self.scale * (jnp.log(t) - jnp.log1p(-t))


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class MixtureSameFamily(Distribution):
    """Mixture of a batch of same-family components.

    ``components`` has batch shape ``batch_shape + (k,)``; ``logits`` has
    shape broadcastable to the same. All CDF-level quantities are exact
    mixtures, which keeps :class:`UniformNoiseAdapter` exact too (additive
    noise commutes with mixing).
    """

    logits: jnp.ndarray
    components: Distribution

    @property
    def batch_shape(self):
        return tuple(self.components.batch_shape[:-1])

    @property
    def _log_weights(self):
        return jax.nn.log_softmax(self.logits, axis=-1)

    def _mix(self, per_component_log):
        return jsp_special.logsumexp(self._log_weights + per_component_log, axis=-1)

    def log_prob(self, x):
        return self._mix(self.components.log_prob(jnp.asarray(x)[..., None]))

    def cdf(self, x):
        return jnp.exp(self.log_cdf(x))

    def log_cdf(self, x):
        return self._mix(self.components.log_cdf(jnp.asarray(x)[..., None]))

    def log_survival_function(self, x):
        return self._mix(
            self.components.log_survival_function(jnp.asarray(x)[..., None])
        )

    def survival_function(self, x):
        return jnp.exp(self.log_survival_function(x))

    # grid protocol -----------------------------------------------------
    def _quantization_offset(self):
        # Mode has no closed form; use the weight-averaged component offset.
        w = jnp.exp(self._log_weights)
        off = self.components._quantization_offset()
        if off is None:
            return None
        return jnp.sum(w * off, axis=-1)

    def _lower_tail(self, tail_mass):
        # Conservative: the minimum of component tails covers the mixture.
        t = self.components._lower_tail(tail_mass)
        return None if t is None else jnp.min(t, axis=-1)

    def _upper_tail(self, tail_mass):
        t = self.components._upper_tail(tail_mass)
        return None if t is None else jnp.max(t, axis=-1)
