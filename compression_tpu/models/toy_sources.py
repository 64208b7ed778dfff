"""Toy sources: nonlinear transform coding on low-dimensional sources.

Re-implementation of the reference's toy-source experiments (reference:
models/toy_sources/ — Ballé & Wagner line of work, SURVEY.md §2.3 M6):
small MLP analysis/synthesis transforms compress samples from synthetic
2-D sources ("banana", Gaussian, Laplacian), exposing the geometry of
learned quantization (the point of the experiments) with the exact same
entropy-model machinery the image codecs use.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
from compression_tpu.layers.priors import DeepFactorizedPrior

__all__ = ["banana", "gaussian", "laplacian", "NTCModel", "Config", "train"]


def banana(key, n: int):
    """The 2-D 'banana' source: a curved Gaussian ridge."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (n,))
    y = jax.random.normal(k2, (n,)) * 0.5 + 0.25 * x**2 - 2.0
    return jnp.stack([x, y], -1)


def gaussian(key, n: int, dim: int = 2):
    return jax.random.normal(key, (n, dim))


def laplacian(key, n: int, dim: int = 2):
    return jax.random.laplace(key, (n, dim))


@dataclasses.dataclass(frozen=True)
class Config:
    lmbda: float = 1.0
    dim: int = 2
    latent_dim: int = 2
    hidden: int = 64
    layers: int = 3


class MLP(nn.Module):
    widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths[:-1]):
            x = nn.softplus(nn.Dense(w, name=f"dense{i}")(x))
        return nn.Dense(self.widths[-1], name="out")(x)


class NTCModel(nn.Module):
    """Nonlinear transform code for vector sources."""

    config: Config = Config()

    def setup(self):
        cfg = self.config
        widths = (cfg.hidden,) * cfg.layers
        self.analysis = MLP(widths + (cfg.latent_dim,))
        self.synthesis = MLP(widths + (cfg.dim,))
        self.prior = DeepFactorizedPrior(batch_shape=(cfg.latent_dim,))

    def __call__(self, x, rng, training: bool = True):
        y = self.analysis(x)
        em = ContinuousBatchedEntropyModel(self.prior(), coding_rank=1)
        y_tilde, bits = em(y, rng=rng, training=training)
        x_hat = self.synthesis(y_tilde)
        return x_hat, bits

    def get_prior(self):
        return self.prior()

    def analyze(self, x):
        return self.analysis(x)

    def synthesize(self, y):
        return self.synthesis(y)


def train(
    cfg: Config,
    source: Callable = banana,
    steps: int = 2000,
    batch_size: int = 512,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Trains an NTC model on a toy source; returns (model, params, history)."""
    import optax

    model = NTCModel(cfg)
    rng = jax.random.PRNGKey(seed)
    rng, k_init, k_data = jax.random.split(rng, 3)
    x0 = source(k_data, batch_size)
    params = model.init(k_init, x0, jax.random.PRNGKey(1), training=True)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        k_data, k_noise = jax.random.split(key)
        x = source(k_data, batch_size)

        def loss_fn(p):
            x_hat, bits = model.apply(p, x, k_noise, training=True)
            rate = jnp.mean(bits)
            dist = jnp.mean(jnp.sum((x - x_hat) ** 2, -1))
            return rate + cfg.lmbda * dist, (rate, dist)

        (loss, (rate, dist)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rate, dist

    history = []
    for i in range(steps):
        rng, k = jax.random.split(rng)
        params, opt_state, rate, dist = step(params, opt_state, k)
        if (i + 1) % max(1, steps // 10) == 0:
            history.append((i + 1, float(rate), float(dist)))
    return model, params, history


def compress_samples(model: NTCModel, params, x):
    """Round-trips samples through the real codec; returns (x_hat, bytes)."""
    prior = model.apply(params, method=NTCModel.get_prior)
    em = ContinuousBatchedEntropyModel(prior, coding_rank=1, compression=True)
    y = model.apply(params, x, method=NTCModel.analyze)
    strings = em.compress(y)
    y_hat = em.decompress(strings, ())
    x_hat = model.apply(params, y_hat, method=NTCModel.synthesize)
    return x_hat, strings
