"""bls2017: factorized-prior end-to-end image codec.

TPU-native re-implementation of the Ballé–Laparra–Simoncelli 2017 codec
("End-to-end optimized image compression"; reference: models/bls2017.py:
1-350): a 3-layer GDN analysis transform, a factorized DeepFactorized
prior over the latents, and a mirrored IGDN synthesis transform. Loss is
``R + lambda * 255^2 * MSE`` on 256x256 crops.

The whole forward-train step is one jitted function; compress/decompress
run the transforms on device and the range coder host-side through the
native codec (one batched call per image batch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
from compression_tpu.layers import GDN, SignalConv2D
from compression_tpu.layers.priors import DeepFactorizedPrior
from compression_tpu.models import common
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util

__all__ = ["BLS2017Model", "Config", "Codec", "make_codec", "compress", "decompress", "train", "SpatialCodec"]


@dataclasses.dataclass(frozen=True)
class Config:
    lmbda: float = 0.01
    distortion: str = "mse"        # "mse" | "msssim" (reference -msssim zoo)
    num_filters: int = 128
    coding_rank: int = 3
    model_name: str = "bls2017"
    downscale: int = 16  # total downsampling of the analysis transform
    # "bls2017": 9x9/4 + 2x 5x5/2 transforms (Ballé 2017).
    # "bmshj2018": the 4x 5x5/2 transform pair from the bmshj2018 paper with
    # the same factorized prior — the reference zoo's
    # `bmshj2018-factorized-*` family (reference: models/tfci.py model list;
    # bmshj2018 paper's factorized-prior baseline).
    arch: str = "bls2017"
    num_latents: int = 0  # bmshj2018 arch: channels of y; 0 = num_filters

    @property
    def latent_channels(self) -> int:
        return self.num_latents or self.num_filters


class AnalysisTransform(nn.Module):
    """x -> y: 9x9/4 then two 5x5/2 SignalConvs with GDN between."""

    num_filters: int

    @nn.compact
    def __call__(self, x):
        x = SignalConv2D(
            self.num_filters, (9, 9), corr=True, strides_down=4,
            padding="same_zeros", use_bias=True, name="conv0",
        )(x)
        x = GDN(name="gdn0")(x)
        x = SignalConv2D(
            self.num_filters, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=True, name="conv1",
        )(x)
        x = GDN(name="gdn1")(x)
        x = SignalConv2D(
            self.num_filters, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=False, name="conv2",
        )(x)
        return x


class SynthesisTransform(nn.Module):
    """y_hat -> x_hat: mirror of the analysis with IGDN and upsampling."""

    num_filters: int

    @nn.compact
    def __call__(self, y):
        y = SignalConv2D(
            self.num_filters, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, name="conv0",
        )(y)
        y = GDN(inverse=True, name="igdn0")(y)
        y = SignalConv2D(
            self.num_filters, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, name="conv1",
        )(y)
        y = GDN(inverse=True, name="igdn1")(y)
        y = SignalConv2D(
            3, (9, 9), corr=False, strides_up=4,
            padding="same_zeros", use_bias=True, name="conv2",
        )(y)
        return y


class BLS2017Model(nn.Module):
    """Analysis + factorized prior + synthesis, as one flax module."""

    config: Config = Config()

    def setup(self):
        cfg = self.config
        if cfg.arch == "bmshj2018":
            # Factorized-prior baseline over the bmshj2018 transforms
            # (reference zoo `bmshj2018-factorized-*`). Same 16x total
            # downsampling, so the codec padding arithmetic is unchanged.
            from compression_tpu.models import bmshj2018 as _b

            self.analysis = _b.AnalysisTransform(
                cfg.num_filters, cfg.latent_channels
            )
            self.synthesis = _b.SynthesisTransform(cfg.num_filters)
        else:
            self.analysis = AnalysisTransform(cfg.num_filters)
            self.synthesis = SynthesisTransform(cfg.num_filters)
        self.prior = DeepFactorizedPrior(batch_shape=(cfg.latent_channels,))

    def __call__(self, x, rng, training: bool = True):
        """Train/eval forward pass: returns (x_hat, bits_per_image)."""
        y = self.analysis(x)
        em = ContinuousBatchedEntropyModel(
            self.prior(), coding_rank=self.config.coding_rank
        )
        y_tilde, bits = em(y, rng=rng, training=training)
        x_hat = self.synthesis(y_tilde)
        return x_hat, bits

    # -- submodule entry points (for compress/decompress paths) -------------

    def analyze(self, x):
        return self.analysis(x)

    def synthesize(self, y_hat):
        return self.synthesis(y_hat)

    def get_prior(self):
        return self.prior()


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def make_loss_fn(model: BLS2017Model):
    cfg = model.config

    def loss_fn(params, batch, rng):
        x = batch  # float32 in [0, 1]
        x_hat, bits = model.apply(params, x, rng, training=True)
        num_pixels = x.shape[1] * x.shape[2]
        bpp = jnp.mean(bits) / num_pixels
        dist, mname, mval = common.distortion_loss(x, x_hat, cfg.distortion)
        loss = bpp + cfg.lmbda * dist
        return loss, {"bpp": bpp, mname: mval}

    return loss_fn


def train(cfg: Config, train_cfg: common.TrainConfig, params=None):
    model = BLS2017Model(cfg)

    def init_fn(rng, batch):
        return model.init(rng, batch, jax.random.PRNGKey(0), training=True)

    return model, common.train_model(
        init_fn, make_loss_fn(model), train_cfg, params=params
    )


# ---------------------------------------------------------------------------
# Coding
# ---------------------------------------------------------------------------


class Codec:
    """One-time jitted transforms + prebuilt tables for a trained model."""

    def __init__(self, model: BLS2017Model, params):
        self.model = model
        self.cfg = model.config
        prior = model.apply(params, method=BLS2017Model.get_prior)
        self.em = ContinuousBatchedEntropyModel(
            prior, coding_rank=model.config.coding_rank, compression=True
        )
        # Params are passed as jit ARGUMENTS, never closed over: closure
        # constants are embedded into the compiled program (HLO bloat; large
        # models exceed remote-compile size limits), while argument buffers
        # stay on device and cost nothing per call.
        self._p = params
        _analyze = jax.jit(
            lambda p, x: model.apply(p, x, method=BLS2017Model.analyze)
        )
        _synthesize = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    model.apply(p, y, method=BLS2017Model.synthesize) * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )
        self._analyze = lambda x: _analyze(self._p, x)
        self._synthesize = lambda y: _synthesize(self._p, y)

    def compress(self, image: np.ndarray) -> bytes:
        x = jnp.asarray(image, jnp.float32)[None] / 255.0
        x, (h, w) = image_util.pad_to_multiple(x, self.cfg.downscale)
        y = self._analyze(x)
        strings = self.em.compress(y)
        packed = PackedTensors()
        packed.model = self.cfg.model_name
        packed.pack(
            [
                strings[0],
                np.array([h, w], np.int32),
                np.array(y.shape[1:3], np.int32),
            ]
        )
        return packed.string

    def decompress(self, data: bytes) -> np.ndarray:
        packed = PackedTensors(data)
        string, xshape, yshape = packed.unpack([object, np.int32, np.int32])
        y_hat = self.em.decompress(
            [bytes(string[0])], tuple(int(v) for v in yshape)
        )
        x_hat = self._synthesize(y_hat)
        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))[0]
        return np.asarray(jax.device_get(x_hat), np.uint8)


def sharded_analyze(model: BLS2017Model, params, x, mesh, axis: str = "data"):
    """H-sharded analysis transform for images too large for one chip's HBM
    (SURVEY.md §5 plan (b): the image-domain analog of context parallelism).

    Each SignalConv runs as a halo-exchange sharded conv over the mesh
    (`parallel.spatial.sharded_signal_conv2d`, ppermute over ICI); GDN is
    pointwise across space, so it applies to the sharded array directly and
    XLA keeps the sharding. Matches ``model.apply(..., method=analyze)``
    exactly (same kernels, same padding arithmetic).

    Args:
      x: (N, H, W, 3) float in [0, 1]; H divisible by mesh size * 16.
    """
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["analysis"]
    x = jnp.asarray(x, p["conv0"]["kernel"].dtype)  # match param dtype
    if model.config.arch == "bmshj2018":
        # Factorized-prior baseline over the bmshj2018 transform pair.
        from compression_tpu.models import bmshj2018 as _b

        return sharded_transform_apply(p, x, mesh, axis, _b._ANALYSIS_LAYERS)
    return sharded_transform_apply(p, x, mesh, axis, [
        {"name": "conv0", "down": 4, "post": "gdn", "gdn": "gdn0"},
        {"name": "conv1", "down": 2, "post": "gdn", "gdn": "gdn1"},
        {"name": "conv2", "down": 2},
    ])


def sharded_synthesize(model: BLS2017Model, params, y_hat, mesh,
                       axis: str = "data"):
    """H-sharded synthesis transform — the decode-side counterpart of
    :func:`sharded_analyze` for reconstructions too large for one chip
    (e.g. gigapixel decode): each upsampling SignalConv runs as a
    halo-exchange phase-decomposed conv
    (`parallel.spatial.sharded_signal_conv2d_up`), IGDN is pointwise and
    stays sharded. Matches ``model.apply(..., method=synthesize)``.

    Args:
      y_hat: (N, h, w, C) latents; h divisible by the mesh size.
    """
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["synthesis"]
    y = jnp.asarray(y_hat, p["conv0"]["kernel"].dtype)
    if model.config.arch == "bmshj2018":
        from compression_tpu.models import bmshj2018 as _b

        return sharded_transform_apply(p, y, mesh, axis, _b._SYNTHESIS_LAYERS)
    return sharded_transform_apply(p, y, mesh, axis, [
        {"name": "conv0", "up": 2, "post": "igdn", "gdn": "igdn0"},
        {"name": "conv1", "up": 2, "post": "igdn", "gdn": "igdn1"},
        {"name": "conv2", "up": 4},
    ])


def make_codec(model: BLS2017Model, params) -> Codec:
    from compression_tpu.models.codec_cache import cached

    return cached(params, lambda: Codec(model, params))


def compress(model: BLS2017Model, params, image: np.ndarray) -> bytes:
    """uint8 (H, W, 3) image -> .tfci-style packed bytes."""
    return make_codec(model, params).compress(image)


def decompress(model: BLS2017Model, params, data: bytes) -> np.ndarray:
    return make_codec(model, params).decompress(data)


class SpatialCodec:
    """Giant-image factorized-prior codec: one image, transforms H-sharded.

    The simplest family's counterpart of ``bmshj2018.SpatialCodec``; with
    a factorized prior the CDF rows are fixed per channel, so there is no
    cross-side row computation to share — only the transforms shard."""

    def __init__(self, model: BLS2017Model, params, mesh, axis="data"):
        self.codec = make_codec(model, params)
        self.cfg = model.config
        self._p = params
        nd = mesh.shape[axis]
        self._mult = self.cfg.downscale * nd
        self._an = jax.jit(
            lambda p, xu8: sharded_analyze(
                model, p, xu8.astype(jnp.float32) / 255.0, mesh, axis
            )
        )
        self._synth = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    sharded_synthesize(model, p, y, mesh, axis) * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )

    def compress(self, image: np.ndarray) -> bytes:
        codec = self.codec
        x = np.asarray(image, np.uint8)[None]
        h, w = x.shape[1], x.shape[2]
        hp, wp = -h % self._mult, -w % self.cfg.downscale
        if hp or wp:
            x = np.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
        y = self._an(self._p, jnp.asarray(x))
        strings = codec.em.compress(y)
        packed = PackedTensors()
        packed.model = self.cfg.model_name
        packed.pack(
            [
                strings[0],
                np.array([h, w], np.int32),
                np.array(y.shape[1:3], np.int32),
            ]
        )
        return packed.string

    def decompress(self, data: bytes) -> np.ndarray:
        codec = self.codec
        packed = PackedTensors(data)
        string, xshape, yshape = packed.unpack([object, np.int32, np.int32])
        y_hat = codec.em.decompress(
            [bytes(string[0])], tuple(int(v) for v in yshape)
        )
        x_hat = np.asarray(
            jax.device_get(self._synth(self._p, jnp.asarray(y_hat)))
        )
        return x_hat[0, : int(xshape[0]), : int(xshape[1]), :]
