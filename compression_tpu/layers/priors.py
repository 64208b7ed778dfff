"""Flax modules that own trainable prior parameters.

The distributions in :mod:`compression_tpu.distributions` are immutable
pytrees; these modules hold their parameters in the flax param tree and
materialize the distribution object each call — the idiomatic JAX split
between state (flax) and math (pytree dataclasses).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from compression_tpu.distributions.deep_factorized import DeepFactorized
from compression_tpu.distributions.uniform_noise import UniformNoiseAdapter

__all__ = ["DeepFactorizedPrior"]


class DeepFactorizedPrior(nn.Module):
    """Owns a trainable DeepFactorized prior (one density per channel).

    ``__call__`` returns the noisy (uniform-noise-convolved) distribution
    ready for an entropy model; ``base`` returns the raw density.
    """

    batch_shape: Tuple[int, ...]
    num_filters: Tuple[int, ...] = (3, 3, 3)
    init_scale: float = 10.0

    @nn.compact
    def __call__(self, noisy: bool = True):
        prior = self.param(
            "deep_factorized",
            lambda key: DeepFactorized.create(
                key,
                batch_shape=tuple(self.batch_shape),
                num_filters=tuple(self.num_filters),
                init_scale=self.init_scale,
            ),
        )
        return UniformNoiseAdapter(prior) if noisy else prior
