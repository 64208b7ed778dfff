"""bmshj2018: scale-hyperprior image codec (the framework's flagship).

TPU-native re-implementation of Ballé, Minnen, Singh, Hwang, Johnston 2018
("Variational image compression with a scale hyperprior"; reference:
models/bmshj2018.py:1-420): a 4-layer GDN analysis/synthesis pair for the
latent y, plus a hyper-analysis/synthesis pair producing a per-element scale
field sigma for y. z is coded with a factorized prior; y with a
scale-indexed location-scale entropy model over the standard log-spaced
scale table (SCALES_MIN=0.11, SCALES_MAX=256, 64 levels).

Two bitstreams per image (z then y); decode runs hyper-synthesis between
them — the canonical two-stage structure every hyperprior codec shares.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.entropy_models import (
    ContinuousBatchedEntropyModel,
    LocationScaleIndexedEntropyModel,
    SCALES_MIN,
)
from compression_tpu.distributions.uniform_noise import NoisyNormal
from compression_tpu.layers import GDN, SignalConv2D
from compression_tpu.layers.priors import DeepFactorizedPrior
from compression_tpu.ops.math_ops import lower_bound
from compression_tpu.models import common
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util

__all__ = ["BMSHJ2018Model", "Config"]


@dataclasses.dataclass(frozen=True)
class Config:
    lmbda: float = 0.01
    num_filters: int = 192      # transform width
    num_latents: int = 192      # channels of y
    num_hyperlatents: int = 128  # channels of z
    model_name: str = "bmshj2018-hyperprior"
    downscale: int = 64          # 16 (analysis) * 4 (hyper-analysis)


class AnalysisTransform(nn.Module):
    num_filters: int
    num_latents: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = SignalConv2D(
                self.num_filters, (5, 5), corr=True, strides_down=2,
                padding="same_zeros", use_bias=True, name=f"conv{i}",
            )(x)
            x = GDN(name=f"gdn{i}")(x)
        return SignalConv2D(
            self.num_latents, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=False, name="conv3",
        )(x)


class SynthesisTransform(nn.Module):
    num_filters: int

    @nn.compact
    def __call__(self, y):
        for i in range(3):
            y = SignalConv2D(
                self.num_filters, (5, 5), corr=False, strides_up=2,
                padding="same_zeros", use_bias=True, name=f"conv{i}",
            )(y)
            y = GDN(inverse=True, name=f"igdn{i}")(y)
        return SignalConv2D(
            3, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, name="conv3",
        )(y)


class HyperAnalysisTransform(nn.Module):
    num_filters: int
    num_hyperlatents: int

    @nn.compact
    def __call__(self, y):
        z = SignalConv2D(
            self.num_filters, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, activation=nn.relu, name="conv0",
        )(jnp.abs(y))
        z = SignalConv2D(
            self.num_filters, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv1",
        )(z)
        return SignalConv2D(
            self.num_hyperlatents, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=False, name="conv2",
        )(z)


class HyperSynthesisTransform(nn.Module):
    """z_hat -> sigma (clamped to the scale table's lower edge)."""

    num_filters: int
    num_latents: int

    @nn.compact
    def __call__(self, z):
        z = SignalConv2D(
            self.num_filters, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv0",
        )(z)
        z = SignalConv2D(
            self.num_filters, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv1",
        )(z)
        sigma = SignalConv2D(
            self.num_latents, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv2",
        )(z)
        # Keep sigma inside the coder's scale-table domain. lower_bound
        # (identity-if-towards) instead of jnp.maximum: at init the conv
        # output is ~0 (< SCALES_MIN everywhere) and a hard max would zero
        # ALL rate gradients into the hyper-synthesis, deadlocking training.
        return lower_bound(sigma, SCALES_MIN)


class BMSHJ2018Model(nn.Module):
    config: Config = Config()

    def setup(self):
        cfg = self.config
        self.analysis = AnalysisTransform(cfg.num_filters, cfg.num_latents)
        self.synthesis = SynthesisTransform(cfg.num_filters)
        self.hyper_analysis = HyperAnalysisTransform(
            cfg.num_filters, cfg.num_hyperlatents
        )
        self.hyper_synthesis = HyperSynthesisTransform(
            cfg.num_filters, cfg.num_latents
        )
        self.hyperprior = DeepFactorizedPrior(
            batch_shape=(cfg.num_hyperlatents,)
        )

    def side_entropy_model(self, **kwargs):
        return ContinuousBatchedEntropyModel(
            self.hyperprior(), coding_rank=3, **kwargs
        )

    @staticmethod
    def main_entropy_model(**kwargs):
        return LocationScaleIndexedEntropyModel(
            NoisyNormal, coding_rank=3, **kwargs
        )

    def __call__(self, x, rng, training: bool = True):
        """Returns (x_hat, y_bits, z_bits) per image."""
        rng_y, rng_z = jax.random.split(rng)
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        side_em = self.side_entropy_model()
        z_tilde, z_bits = side_em(z, rng=rng_z, training=training)
        sigma = self.hyper_synthesis(z_tilde)
        em = self.main_entropy_model()
        y_tilde, y_bits = em(y, sigma, rng=rng_y, training=training)
        x_hat = self.synthesis(y_tilde)
        return x_hat, y_bits, z_bits

    # -- coding entry points -------------------------------------------------

    def encode_latents(self, x):
        """x -> (y, z, sigma of quantized z path not yet applied)."""
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        return y, z

    def sigma_from_zhat(self, z_hat):
        return self.hyper_synthesis(z_hat)

    def synthesize(self, y_hat):
        return self.synthesis(y_hat)

    def get_hyperprior(self):
        return self.hyperprior()


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def make_loss_fn(model: BMSHJ2018Model):
    cfg = model.config

    def loss_fn(params, batch, rng):
        x = batch
        x_hat, y_bits, z_bits = model.apply(params, x, rng, training=True)
        num_pixels = x.shape[1] * x.shape[2]
        bpp = (jnp.mean(y_bits) + jnp.mean(z_bits)) / num_pixels
        mse = jnp.mean(jnp.square(x - x_hat)) * (255.0**2)
        loss = bpp + cfg.lmbda * mse
        return loss, {"bpp": bpp, "mse": mse}

    return loss_fn


def train(cfg: Config, train_cfg: common.TrainConfig, params=None):
    model = BMSHJ2018Model(cfg)

    def init_fn(rng, batch):
        return model.init(rng, batch, jax.random.PRNGKey(0), training=True)

    return model, common.train_model(
        init_fn, make_loss_fn(model), train_cfg, params=params
    )


# ---------------------------------------------------------------------------
# Coding
# ---------------------------------------------------------------------------


class Codec:
    """Jitted transforms + prebuilt CDF tables for a trained model."""

    def __init__(self, model: BMSHJ2018Model, params):
        from compression_tpu.models.codec_cache import tables_via_disk

        self.cfg = model.config
        hyperprior = model.apply(params, method=BMSHJ2018Model.get_hyperprior)
        side_proto = ContinuousBatchedEntropyModel(hyperprior, coding_rank=3)
        main_proto = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=3)
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
        # Encoder front half in ONE jit: transforms + z symbols. The pieces
        # the decoder must reproduce bit-exactly (z_hat -> sigma -> CDF
        # rows) deliberately go through jits SHARED with the decode path
        # (self._sigma, self.em.rows) so encoder and decoder can never
        # disagree on a CDF row due to different XLA fusions.
        z_off = self.side_em.symbol_offset()
        self._z_off_host = np.asarray(z_off, np.float32)

        # Params are jit ARGUMENTS, not closure constants (closure capture
        # embeds the weights into the HLO — large models then exceed
        # remote-compile size limits; argument buffers live on device).
        def _encode_front_p(p, x_uint8):
            # uint8 in, normalize on device: 3x less host->device traffic
            # and zero eager dispatches on the hot path.
            x = x_uint8.astype(jnp.float32) / 255.0
            y, z = model.apply(
                p, x, method=BMSHJ2018Model.encode_latents
            )
            z_sym = jnp.round(z - z_off).astype(jnp.int32)
            y_sym = jnp.round(y).astype(jnp.int32)
            # Ship int16 over the host link (half the bytes); symbols of a
            # sane model are tiny. The overflow flag forces the (never in
            # practice) exact int32 refetch path.
            overflow = jnp.any(jnp.abs(y_sym) > 32767) | jnp.any(
                jnp.abs(z_sym) > 32767
            )
            return (
                y_sym.astype(jnp.int16),
                z_sym.astype(jnp.int16),
                overflow,
                y_sym,
                z_sym,
            )

        self._p = params
        _front = jax.jit(_encode_front_p)

        def encode_front(x):
            y16, z16, overflow, y32, z32 = _front(self._p, x)
            if bool(jax.device_get(overflow)):
                return (
                    np.asarray(jax.device_get(y32)),
                    np.asarray(jax.device_get(z32)),
                )
            y16, z16 = jax.device_get((y16, z16))
            return (
                np.asarray(y16, np.int32),
                np.asarray(z16, np.int32),
            )

        self._encode_front = encode_front
        _sigma = jax.jit(
            lambda p, z: model.apply(
                p, z, method=BMSHJ2018Model.sigma_from_zhat
            )
        )
        _synthesize = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    model.apply(
                        p,
                        y.astype(jnp.float32),
                        method=BMSHJ2018Model.synthesize,
                    )
                    * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )
        self._sigma = lambda z: _sigma(self._p, z)
        self._synthesize = lambda y: _synthesize(self._p, y)

    @staticmethod
    def _slim(values: np.ndarray) -> np.ndarray:
        """int16 when the decoded symbols fit (halves the host->device
        transfer); exact fallback to int32 otherwise."""
        if values.size and (
            values.min() >= -32768 and values.max() <= 32767
        ):
            return values.astype(np.int16)
        return values

    def _zhat_host(self, z_sym: np.ndarray) -> np.ndarray:
        # int symbols + f32 offset: exact in f32, identical on host and
        # device, so encoder and decoder see bit-equal z_hat.
        return z_sym.astype(np.float32) + self._z_off_host

    @staticmethod
    def _pad_np(images: np.ndarray, multiple: int):
        h, w = images.shape[1], images.shape[2]
        hp, wp = -h % multiple, -w % multiple
        if hp or wp:
            images = np.pad(
                images, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge"
            )
        return images, (h, w)

    def compress(self, image: np.ndarray) -> bytes:
        x, (h, w) = self._pad_np(
            np.asarray(image, np.uint8)[None], self.cfg.downscale
        )
        y_sym, z_sym = self._encode_front(jnp.asarray(x))
        sigma = self._sigma(jnp.asarray(self._zhat_host(z_sym)))
        y_rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        z_strings = self.side_em.compress_symbols(z_sym)
        y_strings = self.em.compress_symbols(
            y_sym.reshape(1, -1), y_rows.reshape(1, -1)
        )
        packed = PackedTensors()
        packed.model = self.cfg.model_name
        packed.pack(
            [
                y_strings[0],
                z_strings[0],
                np.array([h, w], np.int32),
                np.array(z_sym.shape[1:3], np.int32),
            ]
        )
        return packed.string

    # -- batched fast paths (same bitstream format, N images at a time) -----

    def compress_batch(self, images: np.ndarray) -> list[bytes]:
        """Compresses a uint8 (N, H, W, 3) stack; one .tfci blob each.

        Batching amortizes dispatch latency and keeps the MXU busy; the
        entropy coder fans the N streams across native threads.
        """
        x, (h, w) = self._pad_np(
            np.asarray(images, np.uint8), self.cfg.downscale
        )
        y_sym, z_sym = self._encode_front(jnp.asarray(x))
        sigma = self._sigma(jnp.asarray(self._zhat_host(z_sym)))
        y_rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        n = x.shape[0]
        z_strings = self.side_em.compress_symbols(z_sym)
        y_strings = self.em.compress_symbols(
            y_sym.reshape(n, -1), y_rows.reshape(n, -1)
        )
        blobs = []
        for i in range(n):
            packed = PackedTensors()
            packed.model = self.cfg.model_name
            packed.pack(
                [
                    y_strings[i],
                    z_strings[i],
                    np.array([h, w], np.int32),
                    np.array(z_sym.shape[1:3], np.int32),
                ]
            )
            blobs.append(packed.string)
        return blobs

    def decompress_batch(self, blobs: list) -> np.ndarray:
        """Decompresses same-size .tfci blobs as one batch."""
        y_strings, z_strings = [], []
        xshape = zshape = None
        for blob in blobs:
            packed = PackedTensors(blob)
            ys, zs, xs, zsh = packed.unpack([object, object, np.int32, np.int32])
            y_strings.append(bytes(ys[0]))
            z_strings.append(bytes(zs[0]))
            xshape, zshape = xs, zsh
        z_hat = self.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        sigma = self._sigma(z_hat)
        y_rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        n = len(blobs)
        values = self.em.decode_symbols(y_strings, y_rows.reshape(n, -1))
        y_hat = jnp.asarray(self._slim(values.reshape(sigma.shape)))
        x_hat = np.asarray(jax.device_get(self._synthesize(y_hat)))
        return x_hat[:, : int(xshape[0]), : int(xshape[1]), :]

    def decompress(self, data: bytes) -> np.ndarray:
        packed = PackedTensors(data)
        y_string, z_string, xshape, zshape = packed.unpack(
            [object, object, np.int32, np.int32]
        )
        z_hat = self.side_em.decompress(
            [bytes(z_string[0])], tuple(int(v) for v in zshape)
        )
        sigma = self._sigma(z_hat)
        y_rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        values = self.em.decode_symbols([bytes(y_string[0])], y_rows)
        y_hat = jnp.asarray(self._slim(values.reshape(sigma.shape)))
        x_hat = np.asarray(jax.device_get(self._synthesize(y_hat)))
        return x_hat[0, : int(xshape[0]), : int(xshape[1]), :]


def make_codec(model: BMSHJ2018Model, params) -> Codec:
    from compression_tpu.models.codec_cache import cached

    return cached(params, lambda: Codec(model, params))


def compress(model: BMSHJ2018Model, params, image: np.ndarray) -> bytes:
    return make_codec(model, params).compress(image)


def decompress(model: BMSHJ2018Model, params, data: bytes) -> np.ndarray:
    return make_codec(model, params).decompress(data)
