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

__all__ = [
    "BMSHJ2018Model",
    "Config",
    "Codec",
    "make_codec",
    "compress",
    "decompress",
    "train",
    "sharded_analyze",
    "sharded_synthesize",
    "sharded_hyper_analyze",
    "sharded_sigma",
    "sharded_encode_latents",
    "SpatialCodec",
]


@dataclasses.dataclass(frozen=True)
class Config:
    lmbda: float = 0.01
    distortion: str = "mse"        # "mse" | "msssim" (reference -msssim zoo)
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
        dist, mname, mval = common.distortion_loss(x, x_hat, cfg.distortion)
        loss = bpp + cfg.lmbda * dist
        return loss, {"bpp": bpp, mname: mval}

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


class _EncodeWork:
    """In-flight encode state: device futures + host-side shape info."""

    __slots__ = ("y8", "y16", "z16", "rows", "fits", "y32", "z32", "hw",
                 "zshape", "n")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class _DecodeWork:
    __slots__ = ("rows", "y_strings", "shape", "xshape")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class _RansEncodeWork:
    """In-flight device-coded encode: rANS stream futures + host fallback
    handles (y8/y16/y32/rows stay unfetched unless overflow forces the
    host coder path)."""

    __slots__ = ("stream", "lengths", "overflow", "z16", "fits", "y8",
                 "y16", "y32", "z32", "rows", "hw", "n", "K")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class _RansDecodeWork:
    __slots__ = ("image", "ok", "xshape")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class Codec:
    """Jitted transforms + prebuilt CDF tables for a trained model.

    The product coding path is *pipelined* (SURVEY.md §3.2: the reference
    serializes transforms -> blocking C++ range coding per batch; BASELINE
    config #2 wants them overlapped). Structure:

    * encode: ONE async dispatch chain on device (transforms -> symbols ->
      z_hat -> sigma -> CDF rows; zero host round-trips), then one
      device_get + native range coding on a worker thread;
    * :meth:`compress_iter` / :meth:`decompress_iter` double-buffer batches
      through :class:`compression_tpu.parallel.pipeline.Pipeline`, so the
      TPU transforms batch i+1 while host threads entropy-code batch i;
    * every stage is accounted in ``self.timer`` (StageTimer) — bench.py
      prints the table so the overlap is measured, not asserted.

    Bit-exactness invariant: the pieces the decoder must reproduce exactly
    (z_hat -> sigma -> CDF rows) go through jits SHARED by the encode and
    decode paths (``self._sigma``, ``self.em.rows``), and z_hat is formed
    as ``int_symbols + f32_offset`` (exact in f32) on both sides, so
    encoder and decoder can never disagree on a CDF row due to different
    XLA fusions.
    """

    def __init__(self, model: BMSHJ2018Model, params):
        from compression_tpu.models.codec_cache import tables_via_disk
        from compression_tpu.util.profiling import StageTimer

        self.cfg = model.config
        self.timer = StageTimer()
        self._model = model
        self._jit_decoders: dict = {}
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
            # z_hat exactly as the decoder forms it: integer symbols + f32
            # offset — both addends exact in f32, so the device add is
            # bit-equal to the decoder's host add, and the SHARED _sigma
            # jit sees identical inputs on both paths.
            z_hat = z_sym.astype(jnp.float32) + z_off
            # Symbols ship in the narrowest width that fits (int8 is 4x
            # less tunnel traffic than int32); the flags select the
            # (rare) wider refetch path without losing exactness.
            fit8 = jnp.all(jnp.abs(y_sym) <= 127)
            fit16 = jnp.all(jnp.abs(y_sym) <= 32767) & jnp.all(
                jnp.abs(z_sym) <= 32767
            )
            return (
                y_sym.astype(jnp.int8),
                y_sym.astype(jnp.int16),
                z_sym.astype(jnp.int16),
                z_hat,
                jnp.stack([fit8, fit16]),
                y_sym,
                z_sym,
            )

        self._p = params
        self._front = jax.jit(_encode_front_p)
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
        from compression_tpu.util.numeric import slim_int

        return slim_int(values)

    @staticmethod
    def _pad_np(images: np.ndarray, multiple: int):
        # Shared host-side pad (util.image); kept as a staticmethod alias
        # because every codec family's dispatch stage calls it.
        return image_util.pad_to_multiple_np(images, multiple)

    # -- encode pipeline stages ---------------------------------------------

    def _dispatch_encode(self, images: np.ndarray) -> _EncodeWork:
        """Device stage: pad, upload, dispatch the full async encode chain
        (transforms -> symbols -> z_hat -> sigma -> rows). Returns
        immediately with device futures."""
        x, hw = self._pad_np(np.asarray(images, np.uint8), self.cfg.downscale)
        with self.timer.stage("enc/dispatch"):
            y8, y16, z16, z_hat, fits, y32, z32 = self._front(
                self._p, jnp.asarray(x)
            )
            sigma = self._sigma(z_hat)
            rows = self.em.rows(sigma)
        return _EncodeWork(
            y8=y8, y16=y16, z16=z16, rows=rows, fits=fits, y32=y32, z32=z32,
            hw=hw, zshape=None, n=x.shape[0],
        )

    def _finish_encode(self, w: _EncodeWork) -> list:
        """Host stage: block on the device chain, range-code, pack blobs."""
        with self.timer.stage("enc/fetch"):
            y8, z16, rows, fits = jax.device_get(
                (w.y8, w.z16, w.rows, w.fits)
            )
            fit8, fit16 = bool(fits[0]), bool(fits[1])
            if not fit16:
                y_sym = np.asarray(jax.device_get(w.y32))
                z_sym = np.asarray(jax.device_get(w.z32))
            elif not fit8:
                y_sym = np.asarray(jax.device_get(w.y16), np.int32)
                z_sym = np.asarray(z16, np.int32)
            else:
                y_sym = np.asarray(y8, np.int32)
                z_sym = np.asarray(z16, np.int32)
        n = w.n
        zshape = z_sym.shape[1:3]
        with self.timer.stage("enc/code_z"):
            z_strings = self.side_em.compress_symbols(z_sym)
        with self.timer.stage("enc/code_y"):
            y_strings = self.em.compress_symbols(
                y_sym.reshape(n, -1), np.asarray(rows).reshape(n, -1)
            )
        with self.timer.stage("enc/pack"):
            h, wd = w.hw
            blobs = []
            for i in range(n):
                packed = PackedTensors()
                packed.model = self.cfg.model_name
                packed.pack(
                    [
                        y_strings[i],
                        z_strings[i],
                        np.array([h, wd], np.int32),
                        np.array(zshape, np.int32),
                    ]
                )
                blobs.append(packed.string)
        return blobs

    # -- decode pipeline stages ---------------------------------------------

    def _dispatch_decode(self, blobs: list) -> _DecodeWork:
        """First stage: parse blobs, host-decode z (small, fast), dispatch
        the device chain z_hat -> sigma -> rows."""
        with self.timer.stage("dec/parse"):
            from compression_tpu.models.device_coding import parse_host_blobs

            y_strings, z_strings, xshape, zshape = parse_host_blobs(blobs)
        with self.timer.stage("dec/code_z"):
            z_hat = self.side_em.decompress(
                z_strings, tuple(int(v) for v in zshape)
            )
        with self.timer.stage("dec/dispatch"):
            sigma = self._sigma(z_hat)
            rows = self.em.rows(sigma)
        return _DecodeWork(
            rows=rows, y_strings=y_strings, shape=sigma.shape, xshape=xshape
        )

    def _finish_decode(self, w: _DecodeWork) -> np.ndarray:
        """Host stage: fetch rows, range-decode y, dispatch synthesis,
        fetch the reconstruction."""
        with self.timer.stage("dec/fetch_rows"):
            rows = np.asarray(jax.device_get(w.rows))
        n = len(w.y_strings)
        with self.timer.stage("dec/code_y"):
            values = self.em.decode_symbols(w.y_strings, rows.reshape(n, -1))
        with self.timer.stage("dec/synth"):
            y_hat = jnp.asarray(self._slim(values.reshape(w.shape)))
            x_hat_dev = self._synthesize(y_hat)
        with self.timer.stage("dec/fetch_image"):
            x_hat = np.asarray(jax.device_get(x_hat_dev))
        return x_hat[:, : int(w.xshape[0]), : int(w.xshape[1]), :]

    # -- device-coded path (on-TPU rANS; codec/rans.py) ----------------------
    #
    # The host coder above must fetch symbols + CDF rows (the dominant
    # stage of BENCH_r02 on a slow link). Here the y stream is entropy-
    # coded ON the device: only the compressed words (~50x smaller) cross
    # the link. z stays host-coded (it is tiny and is needed host-side
    # first at decode anyway). Blob format: 5 fields
    # [y_rans_words, z_string, xshape, zshape, [K]] — decompress_batch
    # auto-detects by field count, so the two formats coexist under the
    # same model name. The y symbols and CDF rows are computed by the SAME
    # shared jits as the host path, so the two coders always agree at the
    # value level (only the bitstream differs; see codec/rans_ref.py).

    def _rans(self, N: int, K: int | None = None):
        # Shared K-selection heuristic, worst-case capacity formula, and
        # per-(N, K) jit cache live in device_coding.rans_for — one
        # definition for every family that writes the device blob format.
        from compression_tpu.models.device_coding import rans_for

        return rans_for(self, N, K)

    def _dispatch_encode_rans(self, images: np.ndarray) -> _RansEncodeWork:
        x, hw = self._pad_np(np.asarray(images, np.uint8), self.cfg.downscale)
        with self.timer.stage("enc/dispatch"):
            y8, y16, z16, z_hat, fits, y32, z32 = self._front(
                self._p, jnp.asarray(x)
            )
            sigma = self._sigma(z_hat)
            rows = self.em.rows(sigma)
            n = x.shape[0]
            N = int(np.prod(sigma.shape[1:]))
            enc, _dec, K, _cap = self._rans(N)
            stream, lengths, overflow = enc(
                y32.reshape(n, -1),
                rows.astype(jnp.int32).reshape(n, -1),
            )
        return _RansEncodeWork(
            stream=stream, lengths=lengths, overflow=overflow, z16=z16,
            fits=fits, y8=y8, y16=y16, y32=y32, z32=z32, rows=rows, hw=hw,
            n=n, K=K,
        )

    def _finish_encode_rans(self, w: _RansEncodeWork) -> list:
        with self.timer.stage("enc/fetch"):
            lengths, overflow, z16, fits = jax.device_get(
                (w.lengths, w.overflow, w.z16, w.fits)
            )
            fit16 = bool(fits[1])
            z_sym = (
                np.asarray(z16, np.int32)
                if fit16
                else np.asarray(jax.device_get(w.z32))
            )
        if bool(np.any(np.asarray(overflow))):
            # Pathological symbol statistics (e.g. an untrained model
            # escaping everywhere at extreme magnitudes): fall back to the
            # host coder using the still-unfetched symbol futures.
            ew = _EncodeWork(
                y8=w.y8, y16=w.y16, z16=w.z16, rows=w.rows, fits=w.fits,
                y32=w.y32, z32=w.z32, hw=w.hw, zshape=None, n=w.n,
            )
            return self._finish_encode(ew)
        zshape = z_sym.shape[1:3]
        with self.timer.stage("enc/code_z"):
            z_strings = self.side_em.compress_symbols(z_sym)
        with self.timer.stage("enc/fetch_stream"):
            # One device->host transfer for the whole batch (sliced to the
            # batch-max length) instead of n round-trips.
            from compression_tpu.models.device_coding import fetch_streams

            streams = fetch_streams(w.stream, lengths)
        with self.timer.stage("enc/pack"):
            h, wd = w.hw
            blobs = []
            for b in range(w.n):
                packed = PackedTensors()
                packed.model = self.cfg.model_name
                packed.pack(
                    [
                        streams[b],
                        z_strings[b],
                        np.array([h, wd], np.int32),
                        np.array(zshape, np.int32),
                        np.array([w.K], np.int32),
                    ]
                )
                blobs.append(packed.string)
        return blobs

    def _dispatch_decode_rans(self, blobs: list) -> _RansDecodeWork:
        y_words, z_strings = [], []
        xshape = zshape = None
        K = None
        with self.timer.stage("dec/parse"):
            for b, blob in enumerate(blobs):
                if not self._is_device_coded(blob):
                    raise ValueError(
                        f"blob {b} is host-coded; a batched decode "
                        "cannot mix host- and device-coded bitstreams"
                    )
                packed = PackedTensors(blob)
                ys, zs, xs, zsh, kk = packed.unpack(
                    [object, object, np.int32, np.int32, np.int32]
                )
                y_words.append(np.frombuffer(bytes(ys[0]), np.uint16))
                z_strings.append(bytes(zs[0]))
                if xshape is not None and not (
                    np.array_equal(xshape, xs)
                    and np.array_equal(zshape, zsh)
                    and K == int(kk[0])
                ):
                    raise ValueError(
                        "batched decode requires same-size blobs: blob "
                        f"{b} has shape/K {tuple(xs)}/{int(kk[0])} vs "
                        f"{tuple(xshape)}/{K}; decode mixed sizes one "
                        "by one"
                    )
                xshape, zshape, K = xs, zsh, int(kk[0])
        with self.timer.stage("dec/code_z"):
            z_hat = self.side_em.decompress(
                z_strings, tuple(int(v) for v in zshape)
            )
        with self.timer.stage("dec/dispatch"):
            sigma = self._sigma(z_hat)
            rows = self.em.rows(sigma)
            n = len(blobs)
            N = int(np.prod(sigma.shape[1:]))
            _enc, dec, _K, _cap = self._rans(N, K)
            from compression_tpu.models.device_coding import pad_words

            values, ok = dec(
                jnp.asarray(pad_words(y_words)),
                rows.astype(jnp.int32).reshape(n, -1),
            )
            y_hat = values.reshape(sigma.shape)
            image = self._synthesize(y_hat)
        return _RansDecodeWork(image=image, ok=ok, xshape=xshape)

    def _finish_decode_rans(self, w: _RansDecodeWork) -> np.ndarray:
        with self.timer.stage("dec/fetch_image"):
            image, ok = jax.device_get((w.image, w.ok))
        if not bool(np.all(np.asarray(ok))):
            raise ValueError("corrupt device-coded bitstream (rANS state)")
        return np.asarray(image)[
            :, : int(w.xshape[0]), : int(w.xshape[1]), :
        ]

    @staticmethod
    def _is_device_coded(blob: bytes) -> bool:
        from compression_tpu.models.device_coding import is_device_coded

        return is_device_coded(blob)

    # -- streaming product paths (double-buffered device/host overlap) ------

    def _enc_stages(self, coder: str):
        if coder == "device":
            return self._dispatch_encode_rans, self._finish_encode_rans
        if coder != "host":
            raise ValueError(f"unknown coder {coder!r} (host|device)")
        return self._dispatch_encode, self._finish_encode

    def compress_iter(self, batches, depth: int = 2, coder: str = "host"):
        """Pipelined encode over an iterable of uint8 (N,H,W,3) stacks:
        yields a list of .tfci blobs per input batch, in order. With
        depth=2 the TPU transforms batch i+1 while host threads
        range-code batch i. ``coder="device"`` entropy-codes y on the TPU
        (rANS) so only compressed words cross the link."""
        from compression_tpu.parallel.pipeline import Pipeline

        dispatch, finish = self._enc_stages(coder)
        yield from Pipeline(dispatch, finish, depth).run(batches)

    def decompress_iter(self, blob_batches, depth: int = 2):
        """Pipelined decode over an iterable of .tfci blob lists (each list
        decoded as one device batch); yields uint8 (N,H,W,3) stacks. The
        coder is auto-detected per batch from the blob format."""
        from compression_tpu.parallel.pipeline import Pipeline

        yield from Pipeline(
            self._dispatch_decode_any, self._finish_decode_any, depth
        ).run(blob_batches)

    def _dispatch_decode_any(self, blobs: list):
        if self._is_device_coded(blobs[0]):
            return self._dispatch_decode_rans(blobs)
        return self._dispatch_decode(blobs)

    def _finish_decode_any(self, w) -> np.ndarray:
        if isinstance(w, _RansDecodeWork):
            return self._finish_decode_rans(w)
        return self._finish_decode(w)

    # -- one-shot convenience wrappers ---------------------------------------

    def compress(self, image: np.ndarray, coder: str = "host") -> bytes:
        return self.compress_batch(np.asarray(image, np.uint8)[None], coder)[0]

    def compress_batch(self, images: np.ndarray, coder: str = "host") -> list:
        """Compresses a uint8 (N, H, W, 3) stack; one .tfci blob each.

        Batching amortizes dispatch latency and keeps the MXU busy; the
        entropy coder fans the N streams across native threads ("host")
        or runs as on-TPU rANS lanes ("device").
        """
        dispatch, finish = self._enc_stages(coder)
        return finish(dispatch(images))

    def decompress_batch(self, blobs: list) -> np.ndarray:
        """Decompresses same-size .tfci blobs as one batch (either coder's
        format, auto-detected)."""
        return self._finish_decode_any(self._dispatch_decode_any(blobs))

    def decompress(self, data: bytes) -> np.ndarray:
        return self.decompress_batch([data])[0]

    # -- fully-jitted serving decode (in-jit coding surface) -----------------
    #
    # SURVEY.md §2.1's design intent for the gen_ops equivalent: entropy
    # coding callable *inside* compiled programs. This is the product path
    # that exercises it: the ENTIRE decode — z range-decode -> z_hat ->
    # hyper-synthesis sigma -> CDF rows -> y range-decode -> synthesis ->
    # uint8 — is ONE jitted program with two `pure_callback`s into the
    # native coder (codec/jax_ops.py). vs the staged host path
    # (_dispatch_decode/_finish_decode): one dispatch instead of five, no
    # intermediate host round-trips for z_hat/sigma/rows — at the price of
    # shipping fixed-capacity bitstream buffers through the device. The
    # callbacks act as XLA barriers, so the sigma/rows subprogram between
    # them compiles like the standalone shared jits and the decoded bytes
    # match the host path exactly (asserted in tests/test_jit_decode.py).

    def _build_jit_decoder(self, n, zshape, sigshape):
        # Stream capacities don't appear here: the jitted program reads
        # them from its buffer arguments' static shapes. The _jit_decoders
        # cache key still includes them so each capacity bucket keeps its
        # own compiled program.
        from compression_tpu.codec.jax_ops import make_jax_decoder

        model = self._model
        side_dec = make_jax_decoder(self.side_em.tables)
        main_dec = make_jax_decoder(self.em.tables)
        z_unit = tuple(zshape) + self.side_em.prior_batch_shape
        z_idx = jnp.asarray(
            np.broadcast_to(
                self.side_em._flat_indexes(z_unit),
                (n, int(np.prod(z_unit))),
            )
        )
        z_off = self.side_em.symbol_offset()

        def decode_prog(p, z_data, z_len, y_data, y_len):
            z_vals = side_dec(z_data, z_len, z_idx)
            # z_hat exactly as the encoder formed it: int symbols + f32
            # offset (both exact in f32 — the bit-exactness contract).
            z_hat = z_vals.reshape((n,) + z_unit).astype(jnp.float32) + z_off
            sigma = model.apply(
                p, z_hat, method=BMSHJ2018Model.sigma_from_zhat
            )
            rows = self.em._em.device_indexes(
                self.em.inverse_scale_fn(sigma)
            )
            y_vals = main_dec(y_data, y_len, rows.reshape(n, -1))
            y_hat = y_vals.reshape((n,) + tuple(sigshape)).astype(jnp.float32)
            x = model.apply(p, y_hat, method=BMSHJ2018Model.synthesize)
            return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)

        return jax.jit(decode_prog)

    @staticmethod
    def _cap_bucket(nbytes: int) -> int:
        """Rounds a stream length up to a power-of-two capacity bucket so
        varying stream lengths reuse a handful of compiled programs."""
        cap = 1024
        while cap < nbytes:
            cap *= 2
        return cap

    def decompress_batch_jit(self, blobs: list) -> np.ndarray:
        """Same-size .tfci blobs through the single-program decoder."""
        if self._is_device_coded(blobs[0]):
            # Device-coded blobs are already decoded by one compiled
            # program (the rANS path); route there.
            return self._finish_decode_rans(self._dispatch_decode_rans(blobs))
        y_strings, z_strings = [], []
        xshape = zshape = None
        for blob in blobs:
            packed = PackedTensors(blob)
            ys, zs, xs, zsh = packed.unpack(
                [object, object, np.int32, np.int32]
            )
            y_strings.append(bytes(ys[0]))
            z_strings.append(bytes(zs[0]))
            xshape, zshape = xs, zsh
        n = len(blobs)
        zshape = tuple(int(v) for v in zshape)
        sigshape = (zshape[0] * 4, zshape[1] * 4, self.cfg.num_latents)
        capz = self._cap_bucket(max(len(s) for s in z_strings))
        capy = self._cap_bucket(max(len(s) for s in y_strings))
        key = (n, zshape, capz, capy)
        fn = self._jit_decoders.get(key)
        if fn is None:
            fn = self._jit_decoders[key] = self._build_jit_decoder(
                n, zshape, sigshape
            )

        def to_buf(strings, cap):
            data = np.zeros((n, cap), np.uint8)
            lengths = np.zeros((n,), np.int32)
            for i, s in enumerate(strings):
                data[i, : len(s)] = np.frombuffer(s, np.uint8)
                lengths[i] = len(s)
            return data, lengths

        z_data, z_len = to_buf(z_strings, capz)
        y_data, y_len = to_buf(y_strings, capy)
        x_hat = np.asarray(
            jax.device_get(fn(self._p, z_data, z_len, y_data, y_len))
        )
        return x_hat[:, : int(xshape[0]), : int(xshape[1]), :]


def make_codec(model: BMSHJ2018Model, params) -> Codec:
    from compression_tpu.models.codec_cache import cached

    return cached(params, lambda: Codec(model, params))


def compress(
    model: BMSHJ2018Model, params, image: np.ndarray, coder: str = "host"
) -> bytes:
    return make_codec(model, params).compress(image, coder)


def decompress(model: BMSHJ2018Model, params, data: bytes) -> np.ndarray:
    return make_codec(model, params).decompress(data)


# ---------------------------------------------------------------------------
# Spatially sharded transforms (images too large for one chip's HBM)
# ---------------------------------------------------------------------------
#
# The flagship's counterpart of bls2017.sharded_analyze/sharded_synthesize
# (SURVEY.md §5 plan (b)): every SignalConv runs as a halo-exchange sharded
# conv over the mesh (parallel.spatial, ppermute over ICI); GDN/IGDN, bias
# and ReLU are pointwise and stay sharded. The hyper pair is covered too,
# so the ENTIRE encode front (x -> y -> z) and decode back-end
# (z_hat -> sigma, y_hat -> x_hat) of the two-stream codec run H-sharded —
# only the (tiny) entropy-coding stage needs gathering. Each function
# matches its dense twin exactly (asserted in tests/test_parallel_extras).


# Layer lists for parallel.spatial.sharded_transform_apply. These four
# stacks are shared with mbt2018 and ms2020 (which import the transform
# classes from here); the GDN analysis/synthesis pair is identical across
# all three families, the hyper pair differs only in widths (carried by
# the params) and the |y| front (bmshj2018's scale-only hyperprior).
_ANALYSIS_LAYERS = [
    {"name": f"conv{i}", "down": 2,
     **({"post": "gdn", "gdn": f"gdn{i}"} if i < 3 else {})}
    for i in range(4)
]
_SYNTHESIS_LAYERS = [
    {"name": f"conv{i}", "up": 2,
     **({"post": "igdn", "gdn": f"igdn{i}"} if i < 3 else {})}
    for i in range(4)
]
_HYPER_ANALYSIS_LAYERS = [
    {"name": "conv0", "down": 1, "post": "relu"},
    {"name": "conv1", "down": 2, "post": "relu"},
    {"name": "conv2", "down": 2},
]
_HYPER_SYNTHESIS_LAYERS = [
    {"name": "conv0", "up": 2, "post": "relu"},
    {"name": "conv1", "up": 2, "post": "relu"},
    {"name": "conv2", "down": 1},
]


def sharded_analyze(model: BMSHJ2018Model, params, x, mesh, axis="data"):
    """H-sharded analysis transform: x (N, H, W, 3) in [0, 1] -> y.

    H must be divisible by ``mesh axis size * 16`` (four stride-2 levels).
    """
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["analysis"]
    x = jnp.asarray(x, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(p, x, mesh, axis, _ANALYSIS_LAYERS)


def sharded_synthesize(model: BMSHJ2018Model, params, y_hat, mesh,
                       axis="data"):
    """H-sharded synthesis: y_hat (N, h, w, C) -> x_hat (N, 16h, 16w, 3).

    h must be divisible by the mesh axis size (and per-shard height >= 2
    for the 5x5 halos)."""
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["synthesis"]
    y = jnp.asarray(y_hat, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(p, y, mesh, axis, _SYNTHESIS_LAYERS)


def sharded_hyper_analyze(model: BMSHJ2018Model, params, y, mesh,
                          axis="data"):
    """H-sharded hyper-analysis: y -> z (two stride-2 levels + one 3x3)."""
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["hyper_analysis"]
    z = jnp.abs(jnp.asarray(y, p["conv0"]["kernel"].dtype))
    return sharded_transform_apply(p, z, mesh, axis, _HYPER_ANALYSIS_LAYERS)


def sharded_sigma(model: BMSHJ2018Model, params, z_hat, mesh, axis="data"):
    """H-sharded hyper-synthesis: z_hat -> sigma (>= SCALES_MIN)."""
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["hyper_synthesis"]
    z = jnp.asarray(z_hat, p["conv0"]["kernel"].dtype)
    sigma = sharded_transform_apply(
        p, z, mesh, axis, _HYPER_SYNTHESIS_LAYERS
    )
    return lower_bound(sigma, SCALES_MIN)


def sharded_encode_latents(model: BMSHJ2018Model, params, x, mesh,
                           axis="data"):
    """The full encode front (x -> y -> z) H-sharded over the mesh.

    H must be divisible by ``mesh axis size * 64`` (Config.downscale per
    shard): 16x from the analysis levels, 4x more from the hyper levels.
    Returns (y, z), both still sharded along H."""
    y = sharded_analyze(model, params, x, mesh, axis)
    z = sharded_hyper_analyze(model, params, y, mesh, axis)
    return y, z


class SpatialCodec:
    """Giant-image codec: one image, transforms H-sharded over the mesh.

    For images too large for one chip's HBM: every transform stage
    (analysis, hyper-analysis, hyper-synthesis, synthesis) runs
    halo-sharded across the devices; only the entropy-coding stage — which
    touches the (16x-64x smaller) latent symbol grids — runs on the host.
    The wire format is the standard 4-field host-coded blob, and the
    bit-exactness invariant mirrors :class:`Codec`'s: encode and decode
    share ONE compiled sharded program for z_hat -> sigma -> CDF rows
    (``self._rows``), and z_hat is formed as ``int_symbols + f32_offset``
    on both sides, so the two sides can never disagree on a row index.
    Decode a spatially-coded stream with a SpatialCodec over the same mesh
    shape; the dense Codec recomputes sigma with a different (unsharded)
    program — equal in practice but not guaranteed bit-equal.
    """

    def __init__(self, model: BMSHJ2018Model, params, mesh, axis="data"):
        self.codec = make_codec(model, params)
        self.cfg = model.config
        self.mesh, self.axis = mesh, axis
        self._p = params
        nd = mesh.shape[axis]
        # H pad multiple: the full encode front is downscale-deep per shard.
        self._mult = self.cfg.downscale * nd
        em = self.codec.em
        z_off = self.codec.side_em.symbol_offset()

        def _front(p, x_uint8):
            x = x_uint8.astype(jnp.float32) / 255.0
            y = sharded_analyze(model, p, x, mesh, axis)
            z = sharded_hyper_analyze(model, p, y, mesh, axis)
            z_sym = jnp.round(z - z_off).astype(jnp.int32)
            y_sym = jnp.round(y).astype(jnp.int32)
            return y_sym, z_sym

        def _rows(p, z_hat):
            sigma = sharded_sigma(model, p, z_hat, mesh, axis)
            return em.rows(sigma)

        def _synth(p, y_hat):
            x = sharded_synthesize(
                model, p, y_hat.astype(jnp.float32), mesh, axis
            )
            return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)

        self._front = jax.jit(_front)
        self._rows = jax.jit(_rows)
        self._synth = jax.jit(_synth)

    def compress(self, image: np.ndarray) -> bytes:
        """uint8 (H, W, 3) -> .tfci blob (H edge-padded to mesh*downscale)."""
        codec = self.codec
        x = np.asarray(image, np.uint8)[None]
        h, w = x.shape[1], x.shape[2]
        hp, wp = -h % self._mult, -w % self.cfg.downscale
        if hp or wp:
            x = np.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
        y_sym, z_sym = self._front(self._p, jnp.asarray(x))
        z_sym = np.asarray(jax.device_get(z_sym))
        # Decoder-exact z_hat: integer symbols + f32 offset (both exact).
        z_hat = jnp.asarray(z_sym.astype(np.float32) + codec._z_off_host)
        rows = np.asarray(jax.device_get(self._rows(self._p, z_hat)))
        y_sym = np.asarray(jax.device_get(y_sym))
        z_strings = codec.side_em.compress_symbols(z_sym)
        y_strings = codec.em.compress_symbols(
            y_sym.reshape(1, -1), rows.reshape(1, -1)
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

    def decompress(self, blob: bytes) -> np.ndarray:
        from compression_tpu.models.device_coding import parse_host_blobs

        codec = self.codec
        y_strings, z_strings, xshape, zshape = parse_host_blobs([blob])
        z_hat = codec.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        rows = np.asarray(
            jax.device_get(self._rows(self._p, jnp.asarray(z_hat)))
        )
        values = codec.em.decode_symbols(y_strings, rows.reshape(1, -1))
        y_hat = jnp.asarray(values.reshape(rows.shape))
        x_hat = np.asarray(jax.device_get(self._synth(self._p, y_hat)))
        return x_hat[0, : int(xshape[0]), : int(xshape[1]), :]
