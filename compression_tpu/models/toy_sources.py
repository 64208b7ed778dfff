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

__all__ = [
    "banana", "gaussian", "laplacian",
    "NTCModel", "Config", "train",
    "ECVQ", "train_ecvq", "rd_point_ntc", "rd_point_ecvq", "compare_ntc_vq",
]


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


# ---------------------------------------------------------------------------
# Entropy-constrained vector quantization — the baseline the reference's
# toy-source experiments compare NTC against (reference: models/toy_sources/
# VQ comparison; Ballé & Wagner, "Nonlinear transform coding", IEEE JSTSP
# 2021 §V). Classic ECVQ: alternate (a) rate-augmented nearest-codeword
# assignment  argmin_k [ -log2 p_k + lambda * ||x - c_k||^2 ]  and
# (b) centroid/probability re-estimation. Both phases are single jitted
# programs (segment-sum scatter; no Python loop over codewords).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ECVQ:
    """Entropy-constrained VQ codebook: (K, dim) centers + code probabilities."""

    codebook: jnp.ndarray       # (K, dim)
    log2_p: jnp.ndarray         # (K,) code lengths in bits (normalized)
    lmbda: float

    def assign(self, x):
        """Rate-augmented nearest-codeword index per sample."""
        d2 = jnp.sum(
            (x[:, None, :] - self.codebook[None, :, :]) ** 2, axis=-1
        )
        cost = -self.log2_p[None, :] + self.lmbda * d2
        return jnp.argmin(cost, axis=-1)

    def rate_distortion(self, x):
        """Mean (bits/sample, squared-error/sample) under hard assignment."""
        idx = self.assign(x)
        rate = jnp.mean(-self.log2_p[idx])
        dist = jnp.mean(jnp.sum((x - self.codebook[idx]) ** 2, axis=-1))
        return rate, dist


def train_ecvq(
    source: Callable,
    lmbda: float,
    num_codewords: int = 256,
    steps: int = 200,
    batch_size: int = 4096,
    seed: int = 0,
    prob_floor: float = 1e-8,
) -> ECVQ:
    """Lloyd-style ECVQ training; returns the trained quantizer.

    Dead codewords (zero assignment mass) keep their position and get the
    probability floor — with the rate-augmented cost they can be revived
    only by distortion pressure, matching the classic algorithm.
    """
    rng = jax.random.PRNGKey(seed)
    rng, k0 = jax.random.split(rng)
    codebook = source(k0, num_codewords)  # init: sample the source
    log2_p = jnp.full((num_codewords,), -np.log2(num_codewords))

    @jax.jit
    def update(codebook, log2_p, key):
        x = source(key, batch_size)
        q = ECVQ(codebook, log2_p, lmbda)
        idx = q.assign(x)
        counts = jax.ops.segment_sum(
            jnp.ones_like(idx, jnp.float32), idx, num_codewords
        )
        sums = jax.ops.segment_sum(x, idx, num_codewords)
        new_cb = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
            codebook,
        )
        p = jnp.maximum(counts / batch_size, prob_floor)
        p = p / jnp.sum(p)
        return new_cb, jnp.log2(p)

    for _ in range(steps):
        rng, k = jax.random.split(rng)
        codebook, log2_p = update(codebook, log2_p, k)
    return ECVQ(codebook, log2_p, lmbda)


def rd_point_ntc(cfg: Config, source: Callable, *, steps=3000,
                 eval_n=65536, seed=0):
    """Trains an NTC model and returns its (rate bits/sample, distortion).

    All eval samples are coded as ONE range-coder stream (coding_rank=2
    over a (1, n, dim) batch): per-stream coder framing is a few bytes, so
    one-stream-per-sample would bias the measured rate by ~tens of
    bits/sample against NTC while ECVQ reports analytic code lengths
    (round-2 review finding)."""
    model, params, _ = train(cfg, source, steps=steps, seed=seed)
    x = source(jax.random.PRNGKey(seed + 1), eval_n)
    prior = model.apply(params, method=NTCModel.get_prior)
    em = ContinuousBatchedEntropyModel(prior, coding_rank=2, compression=True)
    y = model.apply(params, x, method=NTCModel.analyze)
    strings = em.compress(y[None])           # one stream for the whole set
    y_hat = em.decompress(strings, (eval_n,))[0]
    x_hat = model.apply(params, y_hat, method=NTCModel.synthesize)
    rate = sum(len(s) for s in strings) * 8.0 / eval_n  # actual coded bits
    dist = float(jnp.mean(jnp.sum((x - x_hat) ** 2, axis=-1)))
    return rate, dist


def rd_point_ecvq(source: Callable, lmbda: float, *, num_codewords=256,
                  steps=200, eval_n=65536, seed=0):
    q = train_ecvq(source, lmbda, num_codewords=num_codewords, steps=steps,
                   seed=seed)
    x = source(jax.random.PRNGKey(seed + 1), eval_n)
    rate, dist = q.rate_distortion(x)
    return float(rate), float(dist)


def compare_ntc_vq(
    source: Callable = banana,
    lambdas: Tuple[float, ...] = (0.3, 1.0, 3.0, 10.0),
    csv_path: str | None = None,
    ntc_steps: int = 3000,
    vq_steps: int = 200,
    num_codewords: int = 256,
):
    """The reference's headline toy experiment: NTC vs ECVQ R-D sweep.

    Returns rows of (method, lambda, rate bits/sample, mse/sample); writes
    a CSV when a path is given (results/toy_sources role).
    """
    rows = []
    for lam in lambdas:
        r, d = rd_point_ntc(Config(lmbda=lam), source, steps=ntc_steps)
        rows.append(("ntc", lam, r, d))
        r, d = rd_point_ecvq(
            source, lam, num_codewords=num_codewords, steps=vq_steps
        )
        rows.append(("ecvq", lam, r, d))
    if csv_path:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
        with open(csv_path, "w") as f:
            f.write("method,lambda,rate_bits_per_sample,mse_per_sample\n")
            for m, lam, r, d in rows:
                f.write(f"{m},{lam},{r:.4f},{d:.6f}\n")
    return rows
