"""Parameter reparameterizations (sqrt-space nonnegativity, RDFT kernels).

TPU-native re-implementation of the reference parameter wrappers (reference:
tensorflow_compression/python/layers/parameters.py:1-250). The reference
wraps variables in `tf.Module` objects that recompute the effective weight on
each read; in JAX the same idea is a pair of pure functions — an ``init``
that maps the desired effective value into storage space, and an ``apply``
that maps the stored parameter back — used by the flax modules in this
package around their `self.param` declarations.

Two reparameterizations:

* **Nonnegative (GDN) parameterization** — the parameter is stored as
  ``sqrt(value + pedestal)`` and read back as
  ``lower_bound(stored, sqrt(minimum + pedestal))**2 - pedestal``.
  Training happens in sqrt space (gradients scale with the parameter's
  magnitude, which conditions the beta/gamma updates well), the lower bound
  keeps the effective value >= minimum, and `identity_if_towards` gradients
  let the optimizer pull a clipped parameter back in.

* **RDFT parameterization** — conv kernels are stored as coefficients in an
  orthonormal real-DFT basis over the flattened spatial support and read
  back through the inverse transform. Early training then preferentially
  shapes low frequencies (a smoothness prior on filters); because the basis
  is orthonormal, gradient geometry is preserved.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from compression_tpu.ops.math_ops import lower_bound

__all__ = [
    "NONNEG_PEDESTAL",
    "nonneg_init",
    "nonneg_apply",
    "rdft_basis",
    "rdft_init",
    "rdft_apply",
]

# Pedestal keeping sqrt() differentiable at an effective value of zero.
# 2^-18 squared stays clear of float32 denormals while being visually zero.
_REPARAM_OFFSET = 2.0 ** -18
NONNEG_PEDESTAL = _REPARAM_OFFSET ** 2


def nonneg_init(value):
    """Maps an effective (>= 0) initial value into sqrt storage space."""
    value = jnp.asarray(value)
    return jnp.sqrt(jnp.maximum(value + NONNEG_PEDESTAL, NONNEG_PEDESTAL))


def nonneg_apply(stored, minimum: float = 0.0):
    """Reads back the effective value; differentiably enforces >= minimum."""
    bound = (minimum + NONNEG_PEDESTAL) ** 0.5
    stored = lower_bound(stored, bound, gradient="identity_if_towards")
    return jnp.square(stored) - NONNEG_PEDESTAL


def rdft_basis(n: int) -> np.ndarray:
    """Orthonormal real-DFT basis for length-``n`` signals.

    Returns a float64 ``(n, n)`` orthogonal matrix ``B`` whose rows are the
    (unit-norm) cosine/sine harmonics; ``coeffs = B @ signal`` and
    ``signal = B.T @ coeffs``. Computed once per kernel shape at module init
    (NumPy, host side) — never inside the compiled step.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # Build from the complex DFT: real/imag parts of rows 0..n//2, orthonormalized.
    rows = []
    t = np.arange(n)
    for k in range(n // 2 + 1):
        c = np.cos(2 * np.pi * k * t / n)
        rows.append(c)
        if 0 < k < (n + 1) / 2:  # sine rows vanish for k=0 and k=n/2 (even n)
            s = np.sin(2 * np.pi * k * t / n)
            rows.append(s)
    basis = np.stack(rows[:n], axis=0).astype(np.float64)
    norms = np.linalg.norm(basis, axis=1, keepdims=True)
    return basis / norms


def rdft_init(kernel, basis: np.ndarray):
    """Projects an effective kernel into RDFT coefficient space.

    Args:
      kernel: array ``(*support, cin, cout)``.
      basis: ``rdft_basis(prod(support))``.

    Returns:
      Coefficients of shape ``(prod(support), cin, cout)``.
    """
    kernel = jnp.asarray(kernel)
    n = int(np.prod(kernel.shape[:-2])) if kernel.ndim > 2 else kernel.shape[0]
    flat = kernel.reshape((n,) + kernel.shape[-2:])
    b = jnp.asarray(basis, dtype=flat.dtype)
    return jnp.einsum("kn,nio->kio", b, flat)


def rdft_apply(coeffs, basis: np.ndarray, support: tuple):
    """Inverse transform: coefficients -> effective kernel ``(*support, cin, cout)``."""
    b = jnp.asarray(basis, dtype=coeffs.dtype)
    flat = jnp.einsum("kn,kio->nio", b, coeffs)
    return flat.reshape(tuple(support) + coeffs.shape[-2:])


# -- Class-style wrappers (reference API names) -------------------------------
#
# The reference exposes these as tf.Module objects (`tfc.Parameter`,
# `tfc.GDNParameter`, `tfc.RDFTParameter` — reference layers/parameters.py)
# that recompute the effective weight on every read. The JAX-idiomatic core
# above is the pair of pure functions; these thin classes carry the stored
# leaf + static config as registered pytrees, so they pass through
# jit/grad/optax like any other parameter while presenting the familiar
# call-to-read API. The *stored* array is the trainable leaf.

import dataclasses

import jax


class Parameter:
    """Protocol: a reparameterized trainable; ``__call__`` reads the
    effective value (reference layers/parameters.py `Parameter`)."""

    def __call__(self):
        raise NotImplementedError


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GDNParameter(Parameter):
    """Sqrt-space nonnegative parameter (reference `GDNParameter`).

    ``GDNParameter.create(initial, minimum)`` maps an effective value into
    storage space; calling the instance reads back the effective value with
    the >= minimum projection and `identity_if_towards` gradients.
    """

    stored: jnp.ndarray
    minimum: float = 0.0

    @classmethod
    def create(cls, initial_value, minimum: float = 0.0):
        return cls(nonneg_init(initial_value), minimum)

    def __call__(self):
        return nonneg_apply(self.stored, self.minimum)

    def tree_flatten(self):
        return (self.stored,), self.minimum

    @classmethod
    def tree_unflatten(cls, minimum, leaves):
        return cls(leaves[0], minimum)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RDFTParameter(Parameter):
    """Conv kernel stored as real-DFT coefficients (reference
    `RDFTParameter`). ``create`` projects an effective ``(*support, cin,
    cout)`` kernel into coefficient space; calling reads the kernel back
    through the inverse transform."""

    coeffs: jnp.ndarray
    support: tuple

    @classmethod
    def create(cls, kernel):
        kernel = jnp.asarray(kernel)
        support = tuple(int(s) for s in kernel.shape[:-2])
        basis = rdft_basis(int(np.prod(support)))
        return cls(rdft_init(kernel, basis), support)

    def __call__(self):
        basis = rdft_basis(int(np.prod(self.support)))
        return rdft_apply(self.coeffs, basis, self.support)

    def tree_flatten(self):
        return (self.coeffs,), self.support

    @classmethod
    def tree_unflatten(cls, support, leaves):
        return cls(leaves[0], support)


__all__ += ["Parameter", "GDNParameter", "RDFTParameter"]
