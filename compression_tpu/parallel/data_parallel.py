"""Data-parallel training over a device mesh.

The reference is strictly single-device (SURVEY.md §2.4); this module is the
TPU-native scaling path: a 1-D ``data`` mesh, batch sharded over it with
`shard_map`, gradients reduced with `psum` over ICI. Parameters and
optimizer state are replicated (these codecs are a few MB — DP is the right
parallelism; see SURVEY.md §2.4 for why TP/PP are deliberately not built).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_dp_step", "shard_batch"]


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(devices, (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Places a host batch sharded along its leading dim."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis)))


def make_dp_step(loss_fn: Callable, tx: optax.GradientTransformation,
                 num_devices: int | None = None, axis: str = "data"):
    """Builds a jitted data-parallel train step.

    loss_fn: (params, batch, rng) -> (loss, metrics). The returned step has
    signature (params, opt_state, batch, rng) -> (params, opt_state, metrics)
    with params/opt_state replicated and batch sharded on its leading axis.
    """
    mesh = make_mesh(num_devices, axis)

    def shard_step(params, opt_state, batch, rng):
        # Per-device loss on the local batch shard; mean-reduce over the mesh.
        def local_loss(p, local_batch):
            # Decorrelate dither across devices while staying deterministic.
            dev_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            loss, metrics = loss_fn(p, local_batch, dev_rng)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, batch
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, {"loss": loss, **metrics}

    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, batch, rng):
        return mapped(params, opt_state, batch, rng)

    return step
