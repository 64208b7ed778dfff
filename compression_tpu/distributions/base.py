"""Minimal distribution protocol for entropy modeling.

The reference builds on tensorflow_probability; this framework instead uses a
small, purpose-built protocol: distributions are **immutable pytree
dataclasses** whose fields are JAX arrays (parameters), so they can cross
`jit` / `vmap` / `shard_map` boundaries as ordinary arguments — the idiomatic
JAX replacement for TFP's stateful objects.

What entropy models need from a prior (reference:
tensorflow_compression/python/distributions/helpers.py:1-180):

  * ``log_prob(x)`` / ``prob(x)`` — density evaluation (training rate).
  * ``log_cdf`` / ``log_survival_function`` — for stable tail estimation.
  * the grid protocol: ``quantization_offset()``, ``lower_tail(tail_mass)``,
    ``upper_tail(tail_mass)`` — where to center the quantization grid and
    where to truncate the tabulated CDF. Numerical fallbacks live in
    :mod:`compression_tpu.distributions.helpers`.

``batch_shape`` follows the TFP convention: a distribution object represents
a *batch* of scalar (univariate) distributions; density evaluation broadcasts
the input against ``batch_shape``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = ["Distribution", "register_distribution_pytree"]


class Distribution:
    """Base class. Subclasses are frozen dataclasses registered as pytrees."""

    # --- shape protocol ----------------------------------------------------
    @property
    def batch_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    # --- density protocol --------------------------------------------------
    def log_prob(self, x):
        raise NotImplementedError

    def prob(self, x):
        return jnp.exp(self.log_prob(x))

    def cdf(self, x):
        raise NotImplementedError

    def log_cdf(self, x):
        return jnp.log(self.cdf(x))

    def survival_function(self, x):
        return 1.0 - self.cdf(x)

    def log_survival_function(self, x):
        return jnp.log1p(-self.cdf(x))

    # --- grid protocol (entropy models) ------------------------------------
    # Return None to request the numerical fallback in helpers.py.
    def _quantization_offset(self):
        return None

    def _lower_tail(self, tail_mass: float):
        return None

    def _upper_tail(self, tail_mass: float):
        return None


def register_distribution_pytree(cls):
    """Class decorator: register a frozen dataclass Distribution as a pytree.

    Array-typed fields become pytree leaves; fields listed in
    ``cls._static_fields`` (a tuple of names) are hashable aux data. Also
    registers flax state-dict handlers so distributions held as flax params
    (e.g. a trainable prior) serialize to msgpack checkpoints.
    """
    fields = [f.name for f in dataclasses.fields(cls)]
    static = tuple(getattr(cls, "_static_fields", ()))
    dynamic = tuple(f for f in fields if f not in static)

    def flatten(obj):
        children = tuple(getattr(obj, name) for name in dynamic)
        aux = tuple(getattr(obj, name) for name in static)
        return children, aux

    def unflatten(aux, children):
        kwargs: dict[str, Any] = dict(zip(dynamic, children))
        kwargs.update(dict(zip(static, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)

    from flax import serialization

    def to_state(obj):
        return {
            name: serialization.to_state_dict(getattr(obj, name))
            for name in dynamic
        }

    def from_state(target, state):
        kwargs = {
            name: serialization.from_state_dict(getattr(target, name), state[name])
            for name in dynamic
        }
        kwargs.update({name: getattr(target, name) for name in static})
        return cls(**kwargs)

    serialization.register_serialization_state(cls, to_state, from_state)
    return cls
