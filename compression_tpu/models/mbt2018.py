"""mbt2018: mean-scale hyperprior codec.

TPU-native implementation of the *mean-scale* (non-autoregressive) variant
of Minnen, Ballé, Toderici 2018 ("Joint autoregressive and hierarchical
priors for learned image compression"). The reference ships this family
only as pretrained `tfci` models (`mbt2018-mean-*`; SURVEY.md §2.3 M3) —
mechanically it is bmshj2018 with (a) the hyper-analysis reading y itself
rather than |y| and (b) the hyper-synthesis predicting both mu and sigma,
with y coded as `LocationScale(loc=mu, scale=sigma)`.
"""

from __future__ import annotations

import dataclasses

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
from compression_tpu.models.bmshj2018 import (
    AnalysisTransform,
    SynthesisTransform,
)
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util

__all__ = ["MBT2018Model", "Config", "Codec", "make_codec", "compress", "decompress", "train", "SpatialCodec"]


@dataclasses.dataclass(frozen=True)
class Config:
    lmbda: float = 0.01
    distortion: str = "mse"        # "mse" | "msssim" (reference -msssim zoo)
    num_filters: int = 192
    num_latents: int = 320
    num_hyperlatents: int = 192
    model_name: str = "mbt2018-mean"
    downscale: int = 64


class HyperAnalysisTransform(nn.Module):
    """y -> z (signed input; mean prediction needs sign information)."""

    num_filters: int
    num_hyperlatents: int

    @nn.compact
    def __call__(self, y):
        z = SignalConv2D(
            self.num_filters, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, activation=nn.relu, name="conv0",
        )(y)
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
    """z_hat -> (mu, sigma), each with num_latents channels."""

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
            self.num_filters * 3 // 2, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv1",
        )(z)
        out = SignalConv2D(
            2 * self.num_latents, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv2",
        )(z)
        mu, sigma = jnp.split(out, 2, axis=-1)
        # lower_bound, not maximum: keeps rate gradients alive when the
        # predicted sigma starts below the scale-table floor (see bmshj2018).
        return mu, lower_bound(sigma, SCALES_MIN)


class MBT2018Model(nn.Module):
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

    def __call__(self, x, rng, training: bool = True):
        """Mixed-quantization training (reference ms2020-era recipe, which
        introduced mbt2018-mean as its baseline): rate terms use the
        additive-noise surrogate, but every value another network consumes
        (hyper-synthesis input, synthesis input) is the STE-rounded value
        the real decoder will see — a noise-trained synthesis otherwise
        loses several dB at eval to the train/test mismatch."""
        rng_y, rng_z = jax.random.split(rng)
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        side_em = ContinuousBatchedEntropyModel(self.hyperprior(), coding_rank=3)
        _, z_bits = side_em(z, rng=rng_z, training=training)
        z_hat = side_em.quantize(z)
        mu, sigma = self.hyper_synthesis(z_hat)
        em = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=3)
        _, y_bits = em(y, sigma, loc=mu, rng=rng_y, training=training)
        y_hat = em.quantize(y, loc=mu)
        x_hat = self.synthesis(y_hat)
        return x_hat, y_bits, z_bits

    def encode_latents(self, x):
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        return y, z

    def params_from_zhat(self, z_hat):
        return self.hyper_synthesis(z_hat)

    def synthesize(self, y_hat):
        return self.synthesis(y_hat)

    def get_hyperprior(self):
        return self.hyperprior()


def make_loss_fn(model: MBT2018Model):
    cfg = model.config

    def loss_fn(params, batch, rng):
        x = batch
        x_hat, y_bits, z_bits = model.apply(params, x, rng, training=True)
        num_pixels = x.shape[1] * x.shape[2]
        bpp = (jnp.mean(y_bits) + jnp.mean(z_bits)) / num_pixels
        dist, mname, mval = common.distortion_loss(x, x_hat, cfg.distortion)
        return bpp + cfg.lmbda * dist, {"bpp": bpp, mname: mval}

    return loss_fn


def train(cfg: Config, train_cfg: common.TrainConfig, params=None):
    model = MBT2018Model(cfg)

    def init_fn(rng, batch):
        return model.init(rng, batch, jax.random.PRNGKey(0), training=True)

    return model, common.train_model(
        init_fn, make_loss_fn(model), train_cfg, params=params
    )


class Codec:
    """Jitted transforms + prebuilt CDF tables for a trained model."""

    def __init__(self, model: MBT2018Model, params):
        self.cfg = model.config
        from compression_tpu.models.codec_cache import tables_via_disk

        hyperprior = model.apply(params, method=MBT2018Model.get_hyperprior)
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
        # uint8 in, normalize on device: 4x less host->device traffic
        # (see bmshj2018.Codec._encode_front_p).
        _encode = jax.jit(
            lambda p, xu8: model.apply(
                p, xu8.astype(jnp.float32) / 255.0,
                method=MBT2018Model.encode_latents,
            )
        )
        _hparams = jax.jit(
            lambda p, z: model.apply(
                p, z, method=MBT2018Model.params_from_zhat
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
        _synthesize = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    model.apply(p, y, method=MBT2018Model.synthesize) * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )
        self._synthesize = lambda y: _synthesize(self._p, y)
        # z coder boundary on device (see bmshj2018.Codec notes on the
        # exactness of int-symbols + f32-offset on both host and device).
        z_off = self.side_em.symbol_offset()
        self._z_symbols = jax.jit(
            lambda z: jnp.round(z - z_off).astype(jnp.int32)
        )
        self._z_hat = jax.jit(lambda zs: zs.astype(jnp.float32) + z_off)

    # -- encode: one async device chain, one host sync -----------------------

    def _dispatch_encode(self, images: np.ndarray):
        x, (h, w) = image_util.pad_to_multiple_np(
            np.asarray(images, np.uint8), self.cfg.downscale
        )
        y, z = self._encode(jnp.asarray(x))
        z_sym = self._z_symbols(z)
        z_hat = self._z_hat(z_sym)
        mu, sigma = self._params(z_hat)
        sym = self._center_round(y, mu)
        rows = self.em.rows(sigma)
        return sym, rows, z_sym, (h, w), z_hat.shape[1:3]

    def _finish_encode(self, work) -> list:
        sym, rows, z_sym, hw, zshape = work
        sym, rows, z_sym = map(np.asarray, jax.device_get((sym, rows, z_sym)))
        n = sym.shape[0]
        z_strings = self.side_em.compress_symbols(z_sym)
        y_strings = self.em.compress_symbols(
            sym.reshape(n, -1), rows.reshape(n, -1)
        )
        h, w = hw
        blobs = []
        for i in range(n):
            packed = PackedTensors()
            packed.model = self.cfg.model_name
            packed.pack(
                [
                    y_strings[i],
                    z_strings[i],
                    np.array([h, w], np.int32),
                    np.array(zshape, np.int32),
                ]
            )
            blobs.append(packed.string)
        return blobs

    def compress(self, image: np.ndarray, coder: str = "host") -> bytes:
        return self.compress_batch(
            np.asarray(image, np.uint8)[None], coder
        )[0]

    def compress_batch(self, images: np.ndarray, coder: str = "host") -> list:
        """``coder="device"`` entropy-codes y on the accelerator (K-lane
        rANS, models/device_coding.py) — only compressed words cross the
        link; decompress auto-detects the blob format."""
        dispatch, finish = self._enc_stages(coder)
        return finish(dispatch(images))

    def _enc_stages(self, coder: str):
        if coder == "device":
            from compression_tpu.models import device_coding as dc

            return (
                lambda images: dc.dispatch_encode_rans(self, images),
                lambda work: dc.finish_encode_rans(self, work),
            )
        if coder != "host":
            raise ValueError(f"unknown coder {coder!r} (host|device)")
        return self._dispatch_encode, self._finish_encode

    def compress_iter(self, batches, depth: int = 2, coder: str = "host"):
        """Double-buffered encode: device transforms batch i+1 while host
        threads range-code batch i."""
        from compression_tpu.parallel.pipeline import Pipeline

        dispatch, finish = self._enc_stages(coder)
        yield from Pipeline(dispatch, finish, depth).run(batches)

    # -- decode ---------------------------------------------------------------

    def decompress_batch(self, blobs: list) -> np.ndarray:
        from compression_tpu.models import device_coding as dc

        if dc.is_device_coded(blobs[0]):
            return dc.decompress_batch_rans(self, blobs)
        y_strings, z_strings, xshape, zshape = dc.parse_host_blobs(blobs)
        z_hat = self.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        mu, sigma = self._params(z_hat)
        rows = np.asarray(jax.device_get(self.em.rows(sigma)))
        n = len(blobs)
        values = self.em.decode_symbols(y_strings, rows.reshape(n, -1))
        from compression_tpu.util.numeric import slim_int

        y_hat = self._apply_loc(
            jnp.asarray(slim_int(values.reshape(mu.shape))), mu
        )
        x_hat = self._synthesize(y_hat)
        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))
        return np.asarray(jax.device_get(x_hat), np.uint8)

    def decompress_iter(self, blob_batches, depth: int = 2):
        """Staggers batches on worker threads so host range decoding
        overlaps the next batch's device work."""
        from compression_tpu.parallel.pipeline import staggered_map

        yield from staggered_map(self.decompress_batch, blob_batches, depth)

    def decompress(self, data: bytes) -> np.ndarray:
        return self.decompress_batch([data])[0]


def make_codec(model: MBT2018Model, params) -> Codec:
    from compression_tpu.models.codec_cache import cached

    return cached(params, lambda: Codec(model, params))


def compress(
    model: MBT2018Model, params, image: np.ndarray, coder: str = "host"
) -> bytes:
    return make_codec(model, params).compress(image, coder)


def decompress(model: MBT2018Model, params, data: bytes) -> np.ndarray:
    return make_codec(model, params).decompress(data)


# ---------------------------------------------------------------------------
# Spatially sharded transforms (images too large for one chip's HBM)
# ---------------------------------------------------------------------------
#
# Same halo-exchange machinery as the flagship (bmshj2018 — this family
# shares its analysis/synthesis classes, so the same layer lists apply);
# only the hyper pair differs: signed y in (mean prediction needs sign
# information, no |.| front) and a joint (mu, sigma) head out.


def sharded_analyze(model: MBT2018Model, params, x, mesh, axis="data"):
    """H-sharded analysis: x -> y (H divisible by mesh size * 16)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["analysis"]
    x = jnp.asarray(x, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(p, x, mesh, axis, _b._ANALYSIS_LAYERS)


def sharded_synthesize(model: MBT2018Model, params, y_hat, mesh,
                       axis="data"):
    """H-sharded synthesis: y_hat -> x_hat."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["synthesis"]
    y = jnp.asarray(y_hat, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(p, y, mesh, axis, _b._SYNTHESIS_LAYERS)


def sharded_hyper_analyze(model: MBT2018Model, params, y, mesh, axis="data"):
    """H-sharded hyper-analysis: y -> z (signed input)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["hyper_analysis"]
    y = jnp.asarray(y, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(
        p, y, mesh, axis, _b._HYPER_ANALYSIS_LAYERS
    )


def sharded_params(model: MBT2018Model, params, z_hat, mesh, axis="data"):
    """H-sharded hyper-synthesis: z_hat -> (mu, sigma >= SCALES_MIN)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["hyper_synthesis"]
    z = jnp.asarray(z_hat, p["conv0"]["kernel"].dtype)
    out = sharded_transform_apply(
        p, z, mesh, axis, _b._HYPER_SYNTHESIS_LAYERS
    )
    mu, sigma = jnp.split(out, 2, axis=-1)
    return mu, lower_bound(sigma, SCALES_MIN)


def sharded_encode_latents(model: MBT2018Model, params, x, mesh,
                           axis="data"):
    """The full encode front (x -> y -> z) H-sharded over the mesh
    (H divisible by mesh size * 64)."""
    y = sharded_analyze(model, params, x, mesh, axis)
    z = sharded_hyper_analyze(model, params, y, mesh, axis)
    return y, z


class SpatialCodec:
    """Giant-image mean-scale codec: one image, transforms H-sharded.

    The mean-scale counterpart of ``bmshj2018.SpatialCodec``: analysis,
    hyper pair and synthesis run halo-sharded across the mesh, host
    entropy coding on the latent grids, standard 4-field blob. The
    bit-exactness invariant extends to the mean pathway: encode and
    decode share ONE compiled sharded program for z_hat -> (mu, rows)
    (``self._pr``), and the symbol boundary math (round(y - mu) /
    values + mu) uses the same trivially-jitted kernels as the dense
    Codec — so the two sides can never disagree on a symbol or row.
    """

    def __init__(self, model: MBT2018Model, params, mesh, axis="data"):
        self.codec = make_codec(model, params)
        self.cfg = model.config
        self.mesh, self.axis = mesh, axis
        self._p = params
        nd = mesh.shape[axis]
        self._mult = self.cfg.downscale * nd
        em = self.codec.em
        z_off = self.codec.side_em.symbol_offset()
        self._z_off_host = np.asarray(z_off, np.float32)

        def _front(p, x_uint8):
            x = x_uint8.astype(jnp.float32) / 255.0
            y = sharded_analyze(model, p, x, mesh, axis)
            z = sharded_hyper_analyze(model, p, y, mesh, axis)
            z_sym = jnp.round(z - z_off).astype(jnp.int32)
            return y, z_sym

        def _pr(p, z_hat):
            mu, sigma = sharded_params(model, p, z_hat, mesh, axis)
            return mu, em.rows(sigma)

        def _synth(p, y_hat):
            x = sharded_synthesize(model, p, y_hat, mesh, axis)
            return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)

        self._front = jax.jit(_front)
        self._pr = jax.jit(_pr)
        self._synth = jax.jit(_synth)

    def compress(self, image: np.ndarray) -> bytes:
        codec = self.codec
        x = np.asarray(image, np.uint8)[None]
        h, w = x.shape[1], x.shape[2]
        hp, wp = -h % self._mult, -w % self.cfg.downscale
        if hp or wp:
            x = np.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
        y, z_sym = self._front(self._p, jnp.asarray(x))
        z_sym = np.asarray(jax.device_get(z_sym))
        z_hat = jnp.asarray(z_sym.astype(np.float32) + self._z_off_host)
        mu, rows = self._pr(self._p, z_hat)
        sym = np.asarray(jax.device_get(codec._center_round(y, mu)))
        rows = np.asarray(jax.device_get(rows))
        z_strings = codec.side_em.compress_symbols(z_sym)
        y_strings = codec.em.compress_symbols(
            sym.reshape(1, -1), rows.reshape(1, -1)
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
        from compression_tpu.models import device_coding as dc
        from compression_tpu.util.numeric import slim_int

        codec = self.codec
        y_strings, z_strings, xshape, zshape = dc.parse_host_blobs([blob])
        z_hat = codec.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        mu, rows = self._pr(self._p, jnp.asarray(z_hat))
        rows = np.asarray(jax.device_get(rows))
        values = codec.em.decode_symbols(y_strings, rows.reshape(1, -1))
        y_hat = codec._apply_loc(
            jnp.asarray(slim_int(values.reshape(rows.shape))), mu
        )
        x_hat = np.asarray(jax.device_get(self._synth(self._p, y_hat)))
        return x_hat[0, : int(xshape[0]), : int(xshape[1]), :]
