"""GDN: generalized divisive normalization.

TPU-native re-implementation of the reference layer (reference:
tensorflow_compression/python/layers/gdn.py:30-260; Ballé, Laparra &
Simoncelli 2016). For an input with channels ``i``::

    norm_i = beta_i + sum_j gamma_{ij} * |x_j|^alpha
    y_i    = x_i * norm_i^(-epsilon)          (forward)
    y_i    = x_i * norm_i^(+epsilon)          (inverse / IGDN)

Defaults ``alpha=2, epsilon=0.5`` give the classic
``y = x * rsqrt(beta + gamma @ x^2)``. The channel mixing is a 1x1
"conv" — expressed as a single matmul over the channel axis so XLA places
it on the MXU and fuses the surrounding elementwise ops (square, rsqrt,
multiply) into it.

beta/gamma nonnegativity uses the sqrt reparameterization from
:mod:`compression_tpu.layers.parameters` (reference GDNParameter,
parameters.py:1-250): training happens in sqrt space with a differentiable
lower bound.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from compression_tpu.layers import parameters

__all__ = ["GDN"]


class GDN(nn.Module):
    """Generalized divisive normalization over the trailing channel axis.

    Attributes:
      inverse: if True, multiply by the norm pool (IGDN, synthesis side).
      rectify: if True, apply ReLU to the input first.
      alpha: exponent on the pooled activations (2 = squared pooling).
      epsilon: exponent on the norm pool (0.5 = square root).
      beta_min: lower bound for beta (keeps the division well posed).
      gamma_init: gamma is initialized to ``gamma_init * I``.
    """

    inverse: bool = False
    rectify: bool = False
    alpha: float = 2.0
    epsilon: float = 0.5
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Any = None
    # Hand-fused Pallas kernel (TPU; classic alpha=2/epsilon=0.5 form only).
    # Also enabled globally via env TPC_PALLAS_GDN=1.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]

        def beta_init(key, shape, dtype=jnp.float32):
            del key
            return parameters.nonneg_init(jnp.ones(shape, dtype))

        def gamma_init(key, shape, dtype=jnp.float32):
            del key
            return parameters.nonneg_init(self.gamma_init * jnp.eye(channels, dtype=dtype))

        beta_var = self.param("beta", beta_init, (channels,))
        gamma_var = self.param("gamma", gamma_init, (channels, channels))
        beta = parameters.nonneg_apply(beta_var, self.beta_min)
        gamma = parameters.nonneg_apply(gamma_var, 0.0)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            beta = beta.astype(self.dtype)
            gamma = gamma.astype(self.dtype)

        if self.rectify:
            x = nn.relu(x)

        import os

        if (
            (self.use_pallas or os.environ.get("TPC_PALLAS_GDN") == "1")
            and self.alpha == 2.0
            and self.epsilon == 0.5
        ):
            from compression_tpu.layers.pallas.gdn_kernel import fused_gdn

            return fused_gdn(x, beta, gamma, inverse=self.inverse)

        if self.alpha == 1.0:
            pooled = jnp.abs(x)
        elif self.alpha == 2.0:
            pooled = jnp.square(x)
        else:
            pooled = jnp.abs(x) ** self.alpha

        # gamma[j, i]: contribution of input channel j to output channel i —
        # one matmul over channels, batched over all leading/spatial dims.
        norm = jnp.tensordot(pooled, gamma, axes=[[-1], [0]]) + beta

        if self.epsilon == 0.5:
            scale = jnp.sqrt(norm) if self.inverse else jax.lax.rsqrt(norm)
        else:
            scale = norm ** (self.epsilon if self.inverse else -self.epsilon)
        return x * scale
