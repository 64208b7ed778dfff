"""Kernel initializers.

Reference: tensorflow_compression/python/layers/initializers.py:1-45
(`IdentityInitializer`). Here it is a flax-style init function.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["identity_kernel_init"]


def identity_kernel_init(gain: float = 1.0):
    """Returns an init for conv kernels ``(*support, cin, cout)`` that makes
    the layer an identity map at initialization: a centered delta impulse
    times an identity channel mixing (rectangular eye if cin != cout).
    """

    def init(key, shape, dtype=jnp.float32):
        del key
        *support, cin, cout = shape
        kernel = jnp.zeros(shape, dtype)
        center = tuple((k - 1) // 2 for k in support)
        eye = gain * jnp.eye(cin, cout, dtype=dtype)
        return kernel.at[center].set(eye)

    return init
