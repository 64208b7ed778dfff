"""DeepFactorized: the Ballé et al. (2018) non-parametric univariate density.

Re-implementation of the reference's factorized prior (reference:
tensorflow_compression/python/distributions/deep_factorized.py:30-330;
Ballé, Minnen, Singh, Hwang, Johnston 2018, appendix 6.1).

The CDF of each (independent, per-channel) scalar is modeled as

    c(x) = sigmoid( f_K ∘ f_{K-1} ∘ ... ∘ f_1 (x) )

with ``f_k(u) = g_k(softplus(H_k) u + b_k)`` and gating
``g_k(u) = u + tanh(a_k) * tanh(u)`` for the inner layers. All factors are
monotone increasing, so ``c`` is a valid CDF; the density is its derivative,
obtained here with a single ``jax.jvp`` (forward-mode) pass — the idiomatic
JAX replacement for the reference's hand-derived chain rule.

The distribution object is an immutable pytree; trainable variants simply
hold traced arrays (see ``compression_tpu.layers.priors`` for the flax
module that owns the parameters).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from compression_tpu.distributions import helpers
from compression_tpu.distributions.base import (
    Distribution,
    register_distribution_pytree,
)

__all__ = ["DeepFactorized"]


@register_distribution_pytree
@dataclasses.dataclass(frozen=True)
class DeepFactorized(Distribution):
    """Batch of independent scalar densities with learned CDFs.

    Fields (all raw/unconstrained parameters):
      matrices: tuple of arrays, ``batch_shape + (d_out, d_in)`` each;
        effective weight is ``softplus(matrix)``.
      biases: tuple of arrays, ``batch_shape + (d_out, 1)``.
      factors: tuple of arrays (one fewer than matrices),
        ``batch_shape + (d_out, 1)``; effective gate is ``tanh(factor)``.
    """

    matrices: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]
    factors: Tuple[jnp.ndarray, ...]

    @classmethod
    def create(
        cls,
        rng,
        batch_shape: Tuple[int, ...],
        num_filters: Tuple[int, ...] = (3, 3, 3),
        init_scale: float = 10.0,
        dtype=jnp.float32,
    ) -> "DeepFactorized":
        """Fresh parameters matching the reference initialization."""
        batch_shape = tuple(batch_shape)
        filters = (1,) + tuple(num_filters) + (1,)
        scale = init_scale ** (1.0 / (len(num_filters) + 1))
        matrices, biases, factors = [], [], []
        for i in range(len(num_filters) + 1):
            rng, k_b = jax.random.split(rng)
            init = math.log(math.expm1(1.0 / scale / filters[i + 1]))
            matrices.append(
                jnp.full(batch_shape + (filters[i + 1], filters[i]), init, dtype)
            )
            biases.append(
                jax.random.uniform(
                    k_b, batch_shape + (filters[i + 1], 1), dtype, -0.5, 0.5
                )
            )
            if i < len(num_filters):
                factors.append(jnp.zeros(batch_shape + (filters[i + 1], 1), dtype))
        return cls(tuple(matrices), tuple(biases), tuple(factors))

    # ------------------------------------------------------------------
    @property
    def batch_shape(self):
        return tuple(self.matrices[0].shape[:-2])

    def _logits_cumulative(self, x):
        """logit of the CDF, evaluated with broadcasting against batch dims."""
        x = jnp.asarray(x)
        u = x[..., None, None]  # (..., *batch, 1, 1)
        for i, matrix in enumerate(self.matrices):
            u = jax.nn.softplus(matrix) @ u + self.biases[i]
            if i < len(self.factors):
                u = u + jnp.tanh(self.factors[i]) * jnp.tanh(u)
        return u[..., 0, 0]

    def cdf(self, x):
        return jax.nn.sigmoid(self._logits_cumulative(x))

    def log_cdf(self, x):
        return jax.nn.log_sigmoid(self._logits_cumulative(x))

    def survival_function(self, x):
        return jax.nn.sigmoid(-self._logits_cumulative(x))

    def log_survival_function(self, x):
        return jax.nn.log_sigmoid(-self._logits_cumulative(x))

    def log_prob(self, x):
        x = jnp.asarray(x)
        x_b = jnp.broadcast_to(x, jnp.broadcast_shapes(x.shape, self.batch_shape))
        logits, dlogits = jax.jvp(
            self._logits_cumulative, (x_b,), (jnp.ones_like(x_b),)
        )
        # p = sigmoid(l)·sigmoid(-l)·l'  (chain rule through the sigmoid).
        return (
            jax.nn.log_sigmoid(logits)
            + jax.nn.log_sigmoid(-logits)
            + jnp.log(jnp.maximum(dlogits, jnp.finfo(dlogits.dtype).tiny))
        )

    # grid protocol -----------------------------------------------------
    def _grid_points(self, tail_mass):
        """(offset, lower, upper) in ONE batched root-find.

        All three grid anchors are level sets of the same monotone
        ``_logits_cumulative`` (median: 0; tails: +-logit(tail_mass/2)), so
        they solve as one search with a stacked target — one compile and
        one loop instead of three (the entropy-model table build calls
        this; see continuous_base.build_tables).
        """
        t = math.log(tail_mass / 2.0) - math.log1p(-tail_mass / 2.0)
        targets = jnp.asarray([0.0, t, -t], self.matrices[0].dtype)
        shape = (3,) + tuple(self.batch_shape)
        x = helpers.estimate_tails(
            self._logits_cumulative,
            targets.reshape((3,) + (1,) * len(self.batch_shape)),
            shape,
            self.matrices[0].dtype,
        )
        return x[0], x[1], x[2]

    def _quantization_offset(self):
        # Median: root of logits == 0.
        return helpers.estimate_tails(
            self._logits_cumulative, 0.0, self.batch_shape,
            self.matrices[0].dtype,
        )

    def _lower_tail(self, tail_mass):
        target = math.log(tail_mass / 2.0) - math.log1p(-tail_mass / 2.0)
        return helpers.estimate_tails(
            self._logits_cumulative, target, self.batch_shape,
            self.matrices[0].dtype,
        )

    def _upper_tail(self, tail_mass):
        target = -(math.log(tail_mass / 2.0) - math.log1p(-tail_mass / 2.0))
        return helpers.estimate_tails(
            self._logits_cumulative, target, self.batch_shape,
            self.matrices[0].dtype,
        )
