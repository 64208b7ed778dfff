"""HiFiC: generative image codec (rate + distortion + perception + GAN).

TPU-native re-implementation of the reference model (reference:
models/hific/model.py:1-700; Mentzer et al. 2020). Structure:

  Encoder -> y -> [mean-scale hyperprior entropy coding] -> y_hat
  Generator(y_hat) -> x_hat
  Discriminator(x or x_hat, conditioned on y_hat) -> patch logits

Loss (generator side):
  L_G = lambda(bpp) * bpp + k_mse * MSE_255 + k_lpips * LPIPS
        + k_gan * (-log sigmoid(D(x_hat)))
with the two-lambda rate hinge: lambda = lambda_a while bpp exceeds the
target rate, else lambda_b (reference model.py rate targeting).
Discriminator: standard non-saturating logistic loss.

The whole G+D update is ONE jitted train step (both grads in a single
backward region — XLA fuses and overlaps them), unlike the reference's
TF1 graph-and-session loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.entropy_models import (
    ContinuousBatchedEntropyModel,
    LocationScaleIndexedEntropyModel,
)
from compression_tpu.distributions.uniform_noise import NoisyNormal
from compression_tpu.layers.priors import DeepFactorizedPrior
from compression_tpu.models.hific import archs
from compression_tpu.models.hific.configs import HificConfig
from compression_tpu.models.mbt2018 import (
    HyperAnalysisTransform,
    HyperSynthesisTransform,
)
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util

__all__ = [
    "HificModel",
    "make_loss_fns",
    "make_train_steps",
    "compress",
    "decompress",
    "SpatialCodec",
    "sharded_encode",
    "sharded_generate",
    "sharded_encode_latents",
    "sharded_params",
]


class HificModel(nn.Module):
    """Encoder + hyperprior + generator (the G side; D is separate)."""

    config: HificConfig

    def setup(self):
        cfg = self.config
        self.encoder = archs.Encoder(cfg.num_latents)
        self.generator = archs.Generator(cfg.num_residual_blocks)
        self.hyper_analysis = HyperAnalysisTransform(
             cfg.num_hyperlatents, cfg.num_hyperlatents
        )
        self.hyper_synthesis = HyperSynthesisTransform(
            cfg.num_hyperlatents, cfg.num_latents
        )
        self.hyperprior = DeepFactorizedPrior(
            batch_shape=(cfg.num_hyperlatents,)
        )

    def __call__(self, x, rng, training: bool = True):
        """Returns (x_hat, y_hat, bpp, hinge_bpp).

        ``bpp`` is the whole-input rate (the loss's rate term);
        ``hinge_bpp`` is the interior-latent rate the target controller
        compares against ``target_rate`` (see
        ``HificConfig.hinge_boundary_ring`` for why the two differ on
        small training patches).
        """
        rng_y, rng_z, rng_in = jax.random.split(rng, 3)
        y = self.encoder(x)
        z = self.hyper_analysis(y)
        side_em = ContinuousBatchedEntropyModel(self.hyperprior(), coding_rank=3)
        z_tilde, z_bits = side_em(z, rng=rng_z, training=training)
        mu, sigma = self.hyper_synthesis(z_tilde)
        em = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=3)
        # HiFiC decodes from *quantized* latents even in training (the
        # generator must see what the real decoder sees); rate uses noise.
        _, y_bits = em(y, sigma, loc=mu, rng=rng_y, training=training)
        y_hat = em.quantize(y, loc=mu)
        x_hat = self.generator(y_hat)
        num_pixels = x.shape[1] * x.shape[2]
        z_bpp = jnp.mean(z_bits) / num_pixels
        bpp = jnp.mean(y_bits) / num_pixels + z_bpp
        # Interior rate for the hinge: y latents >= `ring` positions from
        # every edge, normalized per covered pixel (16x16 px per latent).
        # z stays whole-patch (its grid is too small to have an interior
        # at training patch sizes; its boundary bias points the same way).
        ring = self.config.hinge_boundary_ring
        hy, wy = y.shape[1], y.shape[2]
        if hy > 2 * ring and wy > 2 * ring:
            sl = (slice(None), slice(ring, hy - ring), slice(ring, wy - ring))
            _, y_bits_in = em(
                y[sl], sigma[sl], loc=mu[sl], rng=rng_in, training=training
            )
            in_px = (hy - 2 * ring) * (wy - 2 * ring) * 16 * 16
            hinge_bpp = jnp.mean(y_bits_in) / in_px + z_bpp
        else:
            hinge_bpp = bpp
        return x_hat, y_hat, bpp, hinge_bpp

    def coded_bpp(self, x):
        """The rate the REAL coder pays, jittable (the probe statistic).

        ``__call__(training=False)[2]`` charges the model-density bits
        ``-log2 p(round(v))``, which can be arbitrarily large where the
        learned prior underfits the data. The product coder pays the
        12-bit QUANTIZED-CDF table instead, whose zero-mass repair floors
        every in-range bucket at one part in 2^precision — so no symbol
        costs more than ~precision bits. Measured on a trained hific-hi
        checkpoint the gap is 2x: density estimate 0.447 bpp vs coded
        0.228 bpp on the same image, all of it in underfit hyperprior z
        channels (density estimate 0.319 vs coded 0.098 bpp; the y path
        matches to 0.0001 bpp). Clamping per-element bits at the coder
        precision reproduces the table-exact z rate to <2%. A rate
        controller must regulate THIS statistic, not the density one
        (reference model.py rate targeting targets the coded bpp of the
        shipped checkpoints).
        """
        precision = 12.0  # range_coder_precision of both product coders
        y = self.encoder(x)
        z = self.hyper_analysis(y)
        side_em = ContinuousBatchedEntropyModel(self.hyperprior(), coding_rank=3)
        z_hat = side_em.quantize(z)
        z_bits = jnp.minimum(
            -side_em._log2_prob(side_em.prior, z_hat), precision
        )
        mu, sigma = self.hyper_synthesis(z_hat)
        em = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=3)
        idx = em._em._normalize_indexes(em.inverse_scale_fn(sigma))
        prior = em._em._make_prior(idx)
        y_bits = jnp.minimum(
            -em._em._log2_prob(prior, jnp.round(y - mu)), precision
        )
        num_pixels = x.shape[1] * x.shape[2]
        return (jnp.mean(jnp.sum(y_bits, axis=(1, 2, 3)))
                + jnp.mean(jnp.sum(z_bits, axis=(1, 2, 3)))) / num_pixels

    def encode_latents(self, x):
        y = self.encoder(x)
        z = self.hyper_analysis(y)
        return y, z

    def params_from_zhat(self, z_hat):
        return self.hyper_synthesis(z_hat)

    def generate(self, y_hat):
        return self.generator(y_hat)

    def get_hyperprior(self):
        return self.hyperprior()


def make_loss_fns(
    model: HificModel,
    disc: archs.Discriminator,
    lpips_model,
    lpips_params,
    cfg: HificConfig,
):
    """The G and D loss functions (exposed so tests can compute the exact
    single-device equivalent of the DP step).

    ``g_loss_fn(g_params, d_vars, batch, rng, pmean_axis=None)`` ->
    ``(loss, aux)``; ``d_loss_fn(d_params, d_state, batch, x_hat, y_hat)``
    -> ``(loss, new_state)``. Inside ``shard_map``, ``pmean_axis`` makes
    the rate hinge a global-batch decision.
    """

    def g_loss_fn(g_params, d_vars, batch, rng, pmean_axis=None,
                  gan_scale=1.0, probe_bpp=-1.0, lam_override=-1.0):
        x_hat, y_hat, bpp, hinge_bpp = model.apply(
            g_params, batch, rng, training=True
        )
        mse = jnp.mean(jnp.square(batch - x_hat)) * (255.0**2)
        perceptual = jnp.mean(
            lpips_model.apply(
                lpips_params, jnp.clip(batch, 0, 1), jnp.clip(x_hat, 0, 1)
            )
        )
        logits_fake = disc.apply(
            d_vars, x_hat, jax.lax.stop_gradient(y_hat), update_stats=False
        )
        gan_loss = jnp.mean(jax.nn.softplus(-logits_fake))  # -log D(x_hat)
        # Rate hinge on the global-batch INTERIOR bpp: under DP the local
        # shard's bpp is only 1/n of the evidence; hinging per-device would
        # let different devices pick different lambdas (reference model.py
        # rate targeting is a whole-batch decision). Interior vs whole-patch:
        # see HificConfig.hinge_boundary_ring.
        hinge_bpp = (
            jax.lax.pmean(hinge_bpp, pmean_axis)
            if pmean_axis is not None
            else hinge_bpp
        )
        # Probe-calibrated controller (HificConfig.rate_probe_glob): a
        # nonnegative probe_bpp — the measured full-resolution rate,
        # replicated across DP shards by the caller — replaces the patch
        # statistic in the comparison. Negative (the default) keeps the
        # patch-statistic hinge.
        probe_bpp = jnp.asarray(probe_bpp, hinge_bpp.dtype)
        hinge_stat = jnp.where(probe_bpp >= 0.0, probe_bpp, hinge_bpp)
        if cfg.hinge_softness > 0.0:
            # Log-proportional controller (HificConfig.hinge_softness):
            # geometric interpolation lambda_b -> lambda_a over rate in
            # [target/2^s, target*2^s]. Same endpoints as the bang-bang
            # arms, but with a finite interior equilibrium — the coded-
            # rate probe is too cliffy for a 128x hard switch.
            err = jnp.log2(
                jnp.maximum(hinge_stat, 1e-6) / cfg.target_rate
            ) / cfg.hinge_softness
            frac = jnp.clip((err + 1.0) * 0.5, 0.0, 1.0)
            lam = jnp.exp(
                (1.0 - frac) * jnp.log(cfg.lambda_b)
                + frac * jnp.log(cfg.lambda_a)
            )
        else:
            lam = jnp.where(
                hinge_stat > cfg.target_rate, cfg.lambda_a, cfg.lambda_b
            )
        # Integral controller (HificConfig.hinge_integral): the host-side
        # integrator in train.py owns lambda and ships it per step; a
        # nonnegative lam_override replaces the memoryless laws above.
        lam_override = jnp.asarray(lam_override, lam.dtype)
        lam = jnp.where(lam_override >= 0.0, lam_override, lam)
        loss = (
            lam * bpp
            + cfg.k_mse * cfg.k_mse_scale * mse
            + cfg.k_lpips * perceptual
            + cfg.k_gan * gan_scale * gan_loss
        )
        aux = {
            "bpp": bpp,
            "hinge_bpp": hinge_bpp,
            "mse": mse,
            "lpips": perceptual,
            "g_gan": gan_loss,
            # Hinge instrumentation (VERDICT r3 item 2): 1.0 while the
            # push-down arm is active. Its running mean over training is
            # the controller duty cycle — ~1.0 means lambda_a saturated
            # (equilibrium above target, bpp NOT regulated by the target),
            # ~0.0 means lambda_b saturated; a healthy bang-bang
            # controller oscillates strictly between.
            "hinge_on": (hinge_stat > cfg.target_rate).astype(jnp.float32),
            "hinge_stat": hinge_stat,
            "lam": lam,
            "x_hat": x_hat,
            "y_hat": y_hat,
        }
        return loss, aux

    def d_loss_fn(d_params, d_state, batch, x_hat, y_hat):
        d_vars = {"params": d_params, **d_state}
        logits_real, vars_out = disc.apply(
            d_vars, batch, y_hat, update_stats=True,
            mutable=["batch_stats"],
        )
        logits_fake, vars_out2 = disc.apply(
            {"params": d_params, **vars_out}, x_hat, y_hat,
            update_stats=True, mutable=["batch_stats"],
        )
        loss = jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(
            jax.nn.softplus(logits_fake)
        )
        return loss, vars_out2

    return g_loss_fn, d_loss_fn


def make_train_steps(
    model: HificModel,
    disc: archs.Discriminator,
    lpips_model,
    lpips_params,
    cfg: HificConfig,
    num_devices: int = 1,
    axis: str = "data",
):
    """Builds the jitted joint G/D train step.

    Returns ``step(g_params, d_vars, g_opt, d_opt, batch, rng)`` ->
    ``(g_params, d_vars, g_opt, d_opt, metrics)``.

    With ``num_devices > 1`` the step is data-parallel over an n-device
    mesh (BASELINE config #5: HiFiC G+D on a v5e-8 DP mesh): the batch is
    sharded on its leading axis, G and D gradients are each ``pmean``'d
    over ICI, and the rate hinge sees the *global-batch* bpp (``pmean``
    before the two-lambda comparison) so the DP step computes the same
    math as a single device on the full batch. Params/opt state stay
    replicated; the discriminator's spectral-norm power-iteration state
    depends only on (replicated) weights, so it stays replicated too.
    """
    g_tx = optax.adam(cfg.lr)
    d_tx = optax.adam(cfg.disc_lr)
    g_loss_fn, d_loss_fn = make_loss_fns(
        model, disc, lpips_model, lpips_params, cfg
    )

    def joint_step(g_params, d_vars, g_opt, d_opt, batch, rng,
                   step_idx=None, pmean_axis=None, probe_bpp=None,
                   lam_override=None):
        if batch.dtype == jnp.uint8:
            # uint8-on-the-wire batches (models/common.crop_dataset):
            # normalize on-device, identical math to host-side /255.
            batch = batch.astype(jnp.float32) / 255.0

        def _reduce(t):
            return (
                jax.lax.pmean(t, pmean_axis) if pmean_axis is not None else t
            )

        # Generator warm-up gate (HificConfig.gan_warmup_steps): while
        # step_idx < warmup the GAN term leaves the G loss and the D
        # update is zeroed. step_idx=None (legacy 6-arg callers) means
        # "past any warm-up" — identical to the pre-warm-up behavior.
        if step_idx is None:
            gate = jnp.float32(1.0)
        else:
            gate = (
                jnp.asarray(step_idx, jnp.int32) >= cfg.gan_warmup_steps
            ).astype(jnp.float32)

        if probe_bpp is None:  # legacy callers: patch-statistic hinge
            probe_bpp = jnp.float32(-1.0)
        if lam_override is None:  # legacy callers: config lambda laws
            lam_override = jnp.float32(-1.0)
        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_params, d_vars, batch, rng, pmean_axis=pmean_axis,
            gan_scale=gate, probe_bpp=probe_bpp, lam_override=lam_override,
        )
        g_grads = _reduce(g_grads)
        g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        d_params = d_vars["params"]
        d_state = {k: v for k, v in d_vars.items() if k != "params"}
        x_hat = jax.lax.stop_gradient(aux.pop("x_hat"))
        y_hat = jax.lax.stop_gradient(aux.pop("y_hat"))
        (d_loss, new_state), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_params, d_state, batch, x_hat, y_hat)
        d_grads = _reduce(d_grads)
        # During GAN warm-up the ENTIRE D update is suppressed — params AND
        # optimizer state. Zeroing just the grads would still advance Adam's
        # step count every warm-up step, so bias correction at warm-up end
        # would behave as if N steps had already happened (damped early D
        # updates vs the fresh optimizer this is meant to emulate). The
        # select keeps the compiled step a single static program.
        d_updates, d_opt_new = d_tx.update(d_grads, d_opt, d_params)
        d_params_new = optax.apply_updates(d_params, d_updates)
        _sel = lambda n, o: jnp.where(gate > 0, n, o)  # noqa: E731
        d_params = jax.tree.map(_sel, d_params_new, d_params)
        d_opt = jax.tree.map(_sel, d_opt_new, d_opt)
        d_vars = {"params": d_params, **new_state}

        metrics = _reduce(
            {"g_loss": g_loss, "d_loss": d_loss, "gan_on": gate, **aux}
        )
        return g_params, d_vars, g_opt, d_opt, metrics

    if num_devices > 1:
        from jax.sharding import PartitionSpec as P

        from compression_tpu.parallel.data_parallel import make_mesh

        mesh = make_mesh(num_devices, axis)

        def shard_step(g_params, d_vars, g_opt, d_opt, batch, rng, step_idx,
                       probe_bpp, lam_override):
            # Decorrelate dither across devices, deterministically.
            dev_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            return joint_step(
                g_params, d_vars, g_opt, d_opt, batch, dev_rng,
                step_idx=step_idx, pmean_axis=axis, probe_bpp=probe_bpp,
                lam_override=lam_override,
            )

        mapped = jax.jit(
            jax.shard_map(
                shard_step,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(axis), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P(), P()),
                check_vma=False,
            )
        )

        def step(g_params, d_vars, g_opt, d_opt, batch, rng, step_idx=None,
                 probe_bpp=None, lam_override=None):
            if step_idx is None:  # legacy 6-arg callers: past any warm-up
                step_idx = cfg.gan_warmup_steps
            if probe_bpp is None:
                probe_bpp = -1.0
            if lam_override is None:
                lam_override = -1.0
            return mapped(
                g_params, d_vars, g_opt, d_opt, batch, rng,
                jnp.asarray(step_idx, jnp.int32),
                jnp.asarray(probe_bpp, jnp.float32),
                jnp.asarray(lam_override, jnp.float32),
            )
    else:
        step = jax.jit(joint_step, static_argnames=("pmean_axis",))

    return step, g_tx, d_tx


# ---------------------------------------------------------------------------
# Coding (identical two-stream structure to mbt2018; generator as synthesis)
# ---------------------------------------------------------------------------


class Codec:
    """Jitted transforms + prebuilt CDF tables for a trained model."""

    def __init__(self, model: HificModel, params):
        self.name = model.config.name
        from compression_tpu.models.codec_cache import tables_via_disk

        hyperprior = model.apply(params, method=HificModel.get_hyperprior)
        side_proto = ContinuousBatchedEntropyModel(hyperprior, coding_rank=3)
        main_proto = LocationScaleIndexedEntropyModel(
            NoisyNormal, coding_rank=3
        )
        tables = tables_via_disk(
            lambda: {
                "side": side_proto.build_tables(),
                "main": main_proto._em.build_tables(),
            },
            key_obj=params,
        )
        self.side_em = ContinuousBatchedEntropyModel(
            hyperprior, coding_rank=3, compression=True, tables=tables["side"]
        )
        self.em = LocationScaleIndexedEntropyModel(
            NoisyNormal, coding_rank=3, compression=True, tables=tables["main"]
        )
        # Params are jit ARGUMENTS, not closure constants (closure capture
        # embeds weights into the HLO; large models exceed remote-compile
        # limits). self._p is device-resident, so calls cost nothing extra.
        self._p = params
        _encode = jax.jit(
            lambda p, x: model.apply(p, x, method=HificModel.encode_latents)
        )
        _hparams = jax.jit(
            lambda p, z: model.apply(
                p, z, method=HificModel.params_from_zhat
            )
        )
        self._encode = lambda x: _encode(self._p, x)
        self._params = lambda z: _hparams(self._p, z)
        # Shared coder-boundary jits (identical compiled code on encode and
        # decode so symbol/row math cannot diverge; see bmshj2018.Codec).
        self._center_round = jax.jit(
            lambda y, mu: jnp.round(y - mu).astype(jnp.int32)
        )
        self._apply_loc = jax.jit(
            lambda v, mu: v.astype(jnp.float32) + mu
        )
        _generate = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    model.apply(p, y, method=HificModel.generate) * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )
        self._generate = lambda y: _generate(self._p, y)
        # Device-coded mode plumbing (models/device_coding.py duck-typing):
        # z coder boundary on device + the shared attribute names.
        z_off = self.side_em.symbol_offset()
        self._z_symbols = jax.jit(
            lambda z: jnp.round(z - z_off).astype(jnp.int32)
        )
        self._z_hat = jax.jit(lambda zs: zs.astype(jnp.float32) + z_off)
        self._synthesize = self._generate
        _encode_u8 = jax.jit(
            lambda p, xu8: model.apply(
                p, xu8.astype(jnp.float32) / 255.0,
                method=HificModel.encode_latents,
            )
        )
        self._encode_u8 = lambda x: _encode_u8(self._p, x)
        import types as _types

        self.cfg = _types.SimpleNamespace(model_name=self.name, downscale=64)

    def compress(self, image: np.ndarray) -> bytes:
        x = jnp.asarray(image, jnp.float32)[None] / 255.0
        x, (h, w) = image_util.pad_to_multiple(x, 64)
        y, z = self._encode(x)
        z_strings = self.side_em.compress(z)
        z_hat = self.side_em.decompress(z_strings, z.shape[1:3])
        mu, sigma = self._params(z_hat)
        sym = np.asarray(jax.device_get(self._center_round(y, mu)))
        rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        n = sym.shape[0]
        y_strings = self.em.compress_symbols(
            sym.reshape(n, -1), rows.reshape(n, -1)
        )
        packed = PackedTensors()
        packed.model = self.name
        packed.pack(
            [
                y_strings[0],
                z_strings[0],
                np.array([h, w], np.int32),
                np.array(z.shape[1:3], np.int32),
            ]
        )
        return packed.string

    def compress_batch(self, images, coder: str = "host"):
        """Batched encode; ``coder="device"`` = on-TPU rANS for y
        (models/device_coding.py)."""
        if coder == "device":
            from compression_tpu.models import device_coding as dc

            return dc.finish_encode_rans(
                self, dc.dispatch_encode_rans(self, images)
            )
        if coder != "host":
            raise ValueError(f"unknown coder {coder!r} (host|device)")
        return [self.compress(im) for im in images]

    def decompress_batch(self, blobs) -> np.ndarray:
        from compression_tpu.models import device_coding as dc

        if dc.is_device_coded(blobs[0]):
            return dc.decompress_batch_rans(self, blobs)
        return np.stack([self.decompress(b) for b in blobs])

    def decompress(self, data: bytes) -> np.ndarray:
        from compression_tpu.models import device_coding as dc

        if dc.is_device_coded(data):
            return dc.decompress_batch_rans(self, [data])[0]
        packed = PackedTensors(data)
        y_string, z_string, xshape, zshape = packed.unpack(
            [object, object, np.int32, np.int32]
        )
        z_hat = self.side_em.decompress(
            [bytes(z_string[0])], tuple(int(v) for v in zshape)
        )
        mu, sigma = self._params(z_hat)
        rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        values = self.em.decode_symbols([bytes(y_string[0])], rows)
        y_hat = self._apply_loc(jnp.asarray(values.reshape(mu.shape)), mu)
        x_hat = self._generate(y_hat)
        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))[0]
        return np.asarray(jax.device_get(x_hat), np.uint8)


def make_codec(model: HificModel, params) -> Codec:
    from compression_tpu.models.codec_cache import cached

    return cached(params, lambda: Codec(model, params))


def compress(
    model: HificModel, params, image: np.ndarray, coder: str = "host"
) -> bytes:
    codec = make_codec(model, params)
    if coder == "device":
        return codec.compress_batch(np.asarray(image, np.uint8)[None],
                                    coder="device")[0]
    return codec.compress(image)


def decompress(model: HificModel, params, data: bytes) -> np.ndarray:
    return make_codec(model, params).decompress(data)


# ---------------------------------------------------------------------------
# Spatially sharded transforms (images too large for one chip's HBM)
# ---------------------------------------------------------------------------
#
# Completes the spatial-sharding story across the zoo: HiFiC's hyper pair
# is mbt2018's (shared classes — its sharded layer lists apply directly);
# the Encoder and Generator need hand wiring because of ChannelNorm and
# the residual trunk. ChannelNorm normalizes over channels PER spatial
# position, so it applies to H-sharded arrays unchanged — only the convs
# exchange halos.


def _cn(p, name, x):
    from compression_tpu.models.hific.archs import ChannelNorm

    return ChannelNorm().apply({"params": p[name]}, x)


def sharded_encode(model: HificModel, params, x, mesh, axis="data"):
    """H-sharded Encoder: image in [0, 1] -> y (H divisible by
    mesh size * 16)."""
    from compression_tpu.parallel.spatial import sharded_signal_conv2d

    p = params["params"]["encoder"]
    x = jnp.asarray(x, p["conv0"]["kernel"].dtype)
    x = sharded_signal_conv2d(
        x, p["conv0"]["kernel"], mesh, axis, corr=True
    ) + p["conv0"]["bias"]
    x = jax.nn.relu(_cn(p, "norm0", x))
    for i in range(4):
        conv = p[f"conv{i + 1}"]
        x = sharded_signal_conv2d(
            x, conv["kernel"], mesh, axis, corr=True, strides_down=2
        ) + conv["bias"]
        x = jax.nn.relu(_cn(p, f"norm{i + 1}", x))
    conv = p["conv_out"]
    return sharded_signal_conv2d(
        x, conv["kernel"], mesh, axis, corr=True
    ) + conv["bias"]


def sharded_generate(model: HificModel, params, y_hat, mesh, axis="data"):
    """H-sharded Generator: y_hat -> image floats (16x upsampled; latent
    H divisible by the mesh size)."""
    from compression_tpu.parallel.spatial import (
        sharded_signal_conv2d,
        sharded_signal_conv2d_up,
    )

    p = params["params"]["generator"]
    x = jnp.asarray(y_hat, p["conv_in"]["kernel"].dtype)
    x = _cn(p, "norm_in", x)
    x = sharded_signal_conv2d(
        x, p["conv_in"]["kernel"], mesh, axis, corr=True
    ) + p["conv_in"]["bias"]
    x = _cn(p, "norm_head", x)
    for i in range(model.config.num_residual_blocks):
        r = p[f"res{i}"]
        h = sharded_signal_conv2d(
            x, r["conv0"]["kernel"], mesh, axis, corr=True
        ) + r["conv0"]["bias"]
        h = jax.nn.relu(_cn(r, "norm0", h))
        h = sharded_signal_conv2d(
            h, r["conv1"]["kernel"], mesh, axis, corr=True
        ) + r["conv1"]["bias"]
        x = x + _cn(r, "norm1", h)
    for i in range(4):
        conv = p[f"up{i}"]
        x = sharded_signal_conv2d_up(
            x, conv["kernel"], mesh, axis, corr=False, strides_up=2
        ) + conv["bias"]
        x = jax.nn.relu(_cn(p, f"upnorm{i}", x))
    conv = p["conv_out"]
    return sharded_signal_conv2d(
        x, conv["kernel"], mesh, axis, corr=True
    ) + conv["bias"]


def sharded_encode_latents(model: HificModel, params, x, mesh, axis="data"):
    """The full encode front (x -> y -> z) H-sharded over the mesh
    (H divisible by mesh size * 64)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    y = sharded_encode(model, params, x, mesh, axis)
    z = sharded_transform_apply(
        params["params"]["hyper_analysis"], y, mesh, axis,
        _b._HYPER_ANALYSIS_LAYERS,
    )
    return y, z


def sharded_params(model: HificModel, params, z_hat, mesh, axis="data"):
    """H-sharded hyper-synthesis: z_hat -> (mu, sigma >= SCALES_MIN) —
    HiFiC shares mbt2018's joint-head hyper pair."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.ops.math_ops import lower_bound
    from compression_tpu.entropy_models import SCALES_MIN
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["hyper_synthesis"]
    z = jnp.asarray(z_hat, p["conv0"]["kernel"].dtype)
    out = sharded_transform_apply(
        p, z, mesh, axis, _b._HYPER_SYNTHESIS_LAYERS
    )
    mu, sigma = jnp.split(out, 2, axis=-1)
    return mu, lower_bound(sigma, SCALES_MIN)


class SpatialCodec:
    """Giant-image generative codec: one image, transforms H-sharded.

    HiFiC's counterpart of ``mbt2018.SpatialCodec``: the ChannelNorm
    encoder, mbt-style hyper pair, and the residual-trunk Generator run
    halo-sharded across the mesh; host entropy coding, standard 4-field
    blob. Encode and decode share ONE compiled sharded z_hat ->
    (mu, rows) program and the dense Codec's coder-boundary jits."""

    def __init__(self, model: HificModel, params, mesh, axis="data"):
        self.codec = make_codec(model, params)
        self.mesh, self.axis = mesh, axis
        self._p = params
        nd = mesh.shape[axis]
        self._mult = 64 * nd
        em = self.codec.em

        def _front(p, x_uint8):
            x = x_uint8.astype(jnp.float32) / 255.0
            return sharded_encode_latents(model, p, x, mesh, axis)

        def _pr(p, z_hat):
            mu, sigma = sharded_params(model, p, z_hat, mesh, axis)
            return mu, em.rows(sigma)

        self._front = jax.jit(_front)
        self._pr = jax.jit(_pr)
        self._synth = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    sharded_generate(model, p, y, mesh, axis) * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )

    def compress(self, image: np.ndarray) -> bytes:
        codec = self.codec
        x = np.asarray(image, np.uint8)[None]
        h, w = x.shape[1], x.shape[2]
        hp, wp = -h % self._mult, -w % 64
        if hp or wp:
            x = np.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
        y, z = self._front(self._p, jnp.asarray(x))
        # Mirror the dense Codec exactly: z round-trips through the coder
        # so z_hat on both sides is the decoder's reconstruction.
        z_strings = codec.side_em.compress(z)
        z_hat = codec.side_em.decompress(z_strings, z.shape[1:3])
        mu, rows = self._pr(self._p, jnp.asarray(z_hat))
        sym = np.asarray(jax.device_get(codec._center_round(y, mu)))
        rows = np.asarray(jax.device_get(rows))
        y_strings = codec.em.compress_symbols(
            sym.reshape(1, -1), rows.reshape(1, -1)
        )
        packed = PackedTensors()
        packed.model = codec.name
        packed.pack(
            [
                y_strings[0],
                z_strings[0],
                np.array([h, w], np.int32),
                np.array(z.shape[1:3], np.int32),
            ]
        )
        return packed.string

    def decompress(self, blob: bytes) -> np.ndarray:
        from compression_tpu.models import device_coding as dc

        codec = self.codec
        y_strings, z_strings, xshape, zshape = dc.parse_host_blobs([blob])
        z_hat = codec.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        mu, rows = self._pr(self._p, jnp.asarray(z_hat))
        rows = np.asarray(jax.device_get(rows))
        values = codec.em.decode_symbols(y_strings, rows.reshape(1, -1))
        y_hat = codec._apply_loc(
            jnp.asarray(values.reshape(rows.shape)), mu
        )
        x_hat = np.asarray(jax.device_get(self._synth(self._p, y_hat)))
        return x_hat[0, : int(xshape[0]), : int(xshape[1]), :]
