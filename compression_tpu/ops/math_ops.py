"""Core math ops with custom gradients.

TPU-native re-implementation of the reference's bounded-gradient ops and the
shared-dither expectation trick (reference: tensorflow_compression/python/ops/
math_ops.py:1-220). These are pure JAX functions with `jax.custom_vjp`
gradients; everything is jit/vmap/shard_map compatible.

Gradient modes for the bound ops (same semantics as the reference):
  * "identity_if_towards" (default): the gradient is passed through iff the
    input is inside the feasible set OR the gradient points into it. This lets
    an optimizer pull a clipped variable back into range while never pushing
    it further out.
  * "disconnected": the plain subgradient of min/max (zero where clipped).
  * "identity": the gradient is always passed through unchanged.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "upper_bound",
    "lower_bound",
    "perturb_and_apply",
]

_VALID_GRADIENTS = ("identity_if_towards", "disconnected", "identity")


# ---------------------------------------------------------------------------
# lower_bound / upper_bound
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lower_bound(inputs, bound, gradient):
    return jnp.maximum(inputs, bound)


def _lower_bound_fwd(inputs, bound, gradient):
    return jnp.maximum(inputs, bound), (inputs, bound)


def _lower_bound_bwd(gradient, res, grad):
    inputs, bound = res
    if gradient == "identity":
        pass_through = jnp.ones_like(inputs, dtype=bool)
    elif gradient == "disconnected":
        pass_through = inputs >= bound
    else:  # identity_if_towards
        # grad < 0 means gradient descent will *increase* the input, i.e. move
        # it toward the feasible set [bound, inf).
        pass_through = (inputs >= bound) | (grad < 0)
    din = jnp.where(pass_through, grad, jnp.zeros_like(grad))
    # The bound is treated as a constant (reference returns no gradient).
    dbound = jnp.zeros_like(jnp.asarray(bound, dtype=grad.dtype))
    return din, dbound


_lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _upper_bound(inputs, bound, gradient):
    return jnp.minimum(inputs, bound)


def _upper_bound_fwd(inputs, bound, gradient):
    return jnp.minimum(inputs, bound), (inputs, bound)


def _upper_bound_bwd(gradient, res, grad):
    inputs, bound = res
    if gradient == "identity":
        pass_through = jnp.ones_like(inputs, dtype=bool)
    elif gradient == "disconnected":
        pass_through = inputs <= bound
    else:  # identity_if_towards
        pass_through = (inputs <= bound) | (grad > 0)
    din = jnp.where(pass_through, grad, jnp.zeros_like(grad))
    dbound = jnp.zeros_like(jnp.asarray(bound, dtype=grad.dtype))
    return din, dbound


_upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


def lower_bound(inputs, bound, gradient: str = "identity_if_towards"):
    """`max(inputs, bound)` with a configurable gradient (see module docs)."""
    if gradient not in _VALID_GRADIENTS:
        raise ValueError(f"Invalid gradient: {gradient!r}; use {_VALID_GRADIENTS}")
    inputs = jnp.asarray(inputs)
    bound = jnp.asarray(bound, dtype=inputs.dtype)
    return _lower_bound(inputs, bound, gradient)


def upper_bound(inputs, bound, gradient: str = "identity_if_towards"):
    """`min(inputs, bound)` with a configurable gradient (see module docs)."""
    if gradient not in _VALID_GRADIENTS:
        raise ValueError(f"Invalid gradient: {gradient!r}; use {_VALID_GRADIENTS}")
    inputs = jnp.asarray(inputs)
    bound = jnp.asarray(bound, dtype=inputs.dtype)
    return _upper_bound(inputs, bound, gradient)


# ---------------------------------------------------------------------------
# perturb_and_apply
# ---------------------------------------------------------------------------


def perturb_and_apply(f: Callable, x, u, *args, expected_grads: bool = True):
    """Applies ``f(x + u, *args)`` with the expectation-consistent gradient.

    ``u`` is an additive dither (typically U(-1/2, 1/2), shared between
    encoder and decoder in universal quantization). With
    ``expected_grads=True`` the gradient w.r.t. ``x`` is the exact gradient of
    ``E_u[f(x+u)]`` for elementwise ``f``::

        d/dx E[f(x+u)] = f(x + 1/2) - f(x - 1/2)

    which removes the gradient noise that plain reparameterization carries
    (Agustsson & Theis 2020). Gradients w.r.t. ``*args`` flow through the
    ordinary autodiff of ``f``. Reference: math_ops.py perturb_and_apply.

    Unlike the reference (which samples ``u`` internally), the dither is an
    explicit argument — JAX PRNG style. Use
    ``jax.random.uniform(key, x.shape, minval=-0.5, maxval=0.5)``.
    """
    if not expected_grads:
        return f(x + u, *args)
    return _perturb_and_apply(f, x, u, args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _perturb_and_apply(f, x, u, args):
    return f(x + u, *args)


def _perturb_and_apply_fwd(f, x, u, args):
    y, vjp_args = jax.vjp(lambda *a: f(jax.lax.stop_gradient(x + u), *a), *args)
    return y, (x, u, args, vjp_args)


def _perturb_and_apply_bwd(f, res, g):
    x, u, args, vjp_args = res
    # Expected gradient w.r.t. x (elementwise f assumed, like the reference).
    dx = g * (f(x + 0.5, *args) - f(x - 0.5, *args))
    dargs = vjp_args(g)
    du = jnp.zeros_like(u)
    return dx, du, tuple(dargs)


_perturb_and_apply.defvjp(_perturb_and_apply_fwd, _perturb_and_apply_bwd)
