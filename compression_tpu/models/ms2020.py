"""ms2020: channel-wise autoregressive entropy model (CHARM).

TPU-native re-implementation of Minnen & Singh 2020 ("Channel-wise
autoregressive entropy models for learned image compression",
arXiv 2007.08739; reference: models/ms2020.py:1-620): the latent y
(320 channels) is split into 10 slices of 32; each slice's (mu_i, sigma_i)
are predicted from hyper features plus the *previously decoded* slices, and
a latent-residual-prediction (LRP) transform reduces the rounding error of
each decoded slice. Decode is sequential over 10 channel slices — not over
pixels — so the autoregression costs ~10 serial steps regardless of image
size (the design point of the paper, and exactly what the slice-pipelined
decoder in :mod:`compression_tpu.parallel.charm_pipeline` overlaps with
host-side range decoding).

Training uses the mixed quantization scheme of the paper: rates are
estimated with additive-noise surrogates, while the autoregressive
conditioning and the synthesis see straight-through-rounded values (the
same values the real decoder will see).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

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
from compression_tpu.ops.round_ops import round_st
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util

__all__ = ["MS2020Model", "Config", "Codec", "make_codec", "compress", "decompress", "train", "SpatialCodec"]


@dataclasses.dataclass(frozen=True)
class Config:
    lmbda: float = 0.01
    distortion: str = "mse"        # "mse" | "msssim" (reference -msssim zoo)
    num_filters: int = 192
    num_latents: int = 320
    num_hyperlatents: int = 192
    num_slices: int = 10
    # Autoregressive context cap: each slice conditions on at most this many
    # previously decoded slices (reference models/ms2020.py
    # max_support_slices=5) — bounds the slice-transform input widths.
    max_support_slices: int = 5
    model_name: str = "ms2020-cc10"
    downscale: int = 64

    @property
    def slice_size(self) -> int:
        assert self.num_latents % self.num_slices == 0
        return self.num_latents // self.num_slices


class HyperAnalysisTransform(nn.Module):
    """y -> z, the paper's widths: 320 -> 256 -> hyperlatent depth
    (reference models/ms2020.py HyperAnalysisTransform; wider first stage
    than bmshj2018's because y itself is 320-deep here)."""

    num_filters: int  # kept for config compat; widths below are the paper's
    num_hyperlatents: int

    @nn.compact
    def __call__(self, y):
        z = SignalConv2D(
            320, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, activation=nn.relu, name="conv0",
        )(y)
        z = SignalConv2D(
            256, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv1",
        )(z)
        return SignalConv2D(
            self.num_hyperlatents, (5, 5), corr=True, strides_down=2,
            padding="same_zeros", use_bias=False, name="conv2",
        )(z)


class HyperSupportTransform(nn.Module):
    """z_hat -> a support feature field (one each for means and scales);
    widths 192 -> 256 -> 320 per the reference's two hyper-synthesis
    transforms (models/ms2020.py HyperSynthesisTransform)."""

    num_filters: int  # kept for config compat
    num_out: int

    @nn.compact
    def __call__(self, z):
        z = SignalConv2D(
            192, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv0",
        )(z)
        z = SignalConv2D(
            256, (5, 5), corr=False, strides_up=2,
            padding="same_zeros", use_bias=True, activation=nn.relu,
            name="conv1",
        )(z)
        return SignalConv2D(
            self.num_out, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv2",
        )(z)


class SliceTransform(nn.Module):
    """Per-slice parameter/LRP network: 5x5, 5x5, 3x3 convs with widths
    224 -> 128 -> out (reference models/ms2020.py SliceTransform).

    ``zero_final`` zero-initializes the last conv's kernel: used for the
    LRP transforms so residual prediction starts exactly at zero (decoded
    slices are unperturbed at init; tanh'(0)=1 keeps gradients alive) —
    without it the autoregressive chain injects +-0.5-scale noise into
    every downstream slice and the synthesis for the whole early phase of
    training, which round 2 measured as persistent loss oscillation."""

    num_out: int
    zero_final: bool = False

    @nn.compact
    def __call__(self, x):
        x = SignalConv2D(
            224, (5, 5), corr=True, padding="same_zeros", use_bias=True,
            activation=nn.relu, name="conv0",
        )(x)
        x = SignalConv2D(
            128, (5, 5), corr=True, padding="same_zeros", use_bias=True,
            activation=nn.relu, name="conv1",
        )(x)
        kw = {}
        if self.zero_final:
            kw["kernel_init"] = nn.initializers.zeros_init()
        return SignalConv2D(
            self.num_out, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv2", **kw,
        )(x)


class MS2020Model(nn.Module):
    config: Config = Config()

    def setup(self):
        cfg = self.config
        s = cfg.slice_size
        self.analysis = AnalysisTransform(cfg.num_filters, cfg.num_latents)
        self.synthesis = SynthesisTransform(cfg.num_filters)
        self.hyper_analysis = HyperAnalysisTransform(
            cfg.num_filters, cfg.num_hyperlatents
        )
        self.mean_support = HyperSupportTransform(
            cfg.num_filters, cfg.num_latents, name="mean_support"
        )
        self.scale_support = HyperSupportTransform(
            cfg.num_filters, cfg.num_latents, name="scale_support"
        )
        self.mean_transforms = [
            SliceTransform(s, name=f"mean_t{i}") for i in range(cfg.num_slices)
        ]
        self.scale_transforms = [
            SliceTransform(s, name=f"scale_t{i}") for i in range(cfg.num_slices)
        ]
        self.lrp_transforms = [
            SliceTransform(s, zero_final=True, name=f"lrp_t{i}")
            for i in range(cfg.num_slices)
        ]
        self.hyperprior = DeepFactorizedPrior(
            batch_shape=(cfg.num_hyperlatents,)
        )

    # -- slice machinery ------------------------------------------------------

    def _support(self, decoded: List) -> List:
        """Caps the autoregressive context at max_support_slices decoded
        slices (reference max_support_slices=5)."""
        m = self.config.max_support_slices
        return decoded if m < 0 else decoded[:m]

    def slice_params(self, i: int, mu_sup, sigma_sup, decoded: List):
        """(mu_i, sigma_i) from the supports and previously decoded slices."""
        support = self._support(decoded)
        ctx = jnp.concatenate([mu_sup] + support, axis=-1)
        mu = self.mean_transforms[i](ctx)
        ctx_s = jnp.concatenate([sigma_sup] + support, axis=-1)
        # lower_bound, not maximum: keeps rate gradients alive when the
        # predicted sigma starts below the scale-table floor (see bmshj2018).
        sigma = lower_bound(self.scale_transforms[i](ctx_s), SCALES_MIN)
        return mu, sigma

    def slice_lrp(self, i: int, mu_sup, decoded_with_current: List):
        """Latent residual prediction, bounded to half a quantization bin.

        Context = the (capped) support slices plus the just-decoded slice
        itself (reference: lrp_support = [mean_support, y_hat_slice])."""
        ctx = jnp.concatenate(
            [mu_sup]
            + self._support(decoded_with_current[:-1])
            + decoded_with_current[-1:],
            axis=-1,
        )
        return 0.5 * jnp.tanh(self.lrp_transforms[i](ctx))

    # -- training forward -----------------------------------------------------

    def __call__(self, x, rng, training: bool = True):
        cfg = self.config
        s = cfg.slice_size
        rng_z, rng_y = jax.random.split(rng)
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        side_em = ContinuousBatchedEntropyModel(self.hyperprior(), coding_rank=3)
        _, z_bits = side_em(z, rng=rng_z, training=training)
        # Supports see the decoder's z (STE round); rate uses the noise
        # surrogate above (mixed quantization — matching the y path below).
        z_hat = side_em.quantize(z)
        mu_sup = self.mean_support(z_hat)
        sigma_sup = self.scale_support(z_hat)

        em = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=3)
        decoded: List = []
        y_bits_total = 0.0
        for i in range(cfg.num_slices):
            y_i = y[..., i * s : (i + 1) * s]
            mu, sigma = self.slice_params(i, mu_sup, sigma_sup, decoded)
            rng_y, rng_i = jax.random.split(rng_y)
            # Rate: additive-noise surrogate on the centered slice.
            _, bits_i = em(y_i, sigma, loc=mu, rng=rng_i, training=training)
            y_bits_total = y_bits_total + bits_i
            # Conditioning/synthesis path: the decoder's values (STE round).
            y_hat_i = round_st(y_i - mu) + mu
            y_hat_i = y_hat_i + self.slice_lrp(i, mu_sup, decoded + [y_hat_i])
            decoded.append(y_hat_i)

        y_hat = jnp.concatenate(decoded, axis=-1)
        x_hat = self.synthesis(y_hat)
        return x_hat, y_bits_total, z_bits

    # -- coding entry points ---------------------------------------------------

    def encode_latents(self, x):
        y = self.analysis(x)
        z = self.hyper_analysis(y)
        return y, z

    def supports_from_zhat(self, z_hat):
        return self.mean_support(z_hat), self.scale_support(z_hat)

    def synthesize(self, y_hat):
        return self.synthesis(y_hat)

    def get_hyperprior(self):
        return self.hyperprior()


def make_loss_fn(model: MS2020Model):
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
    model = MS2020Model(cfg)

    def init_fn(rng, batch):
        return model.init(rng, batch, jax.random.PRNGKey(0), training=True)

    return model, common.train_model(
        init_fn, make_loss_fn(model), train_cfg, params=params
    )


# ---------------------------------------------------------------------------
# Coding (the 10-slice serial loop; see SURVEY.md §3.3)
# ---------------------------------------------------------------------------


class Codec:
    """Jitted per-slice transforms + prebuilt CDF tables.

    Each slice index gets its own compiled function (static index, growing
    list of decoded slices) — 10 small compiles, reused for every image.
    """

    def __init__(self, model: MS2020Model, params):
        self.cfg = model.config
        self._rans_cache: dict = {}
        from compression_tpu.models.codec_cache import tables_via_disk

        hyperprior = model.apply(params, method=MS2020Model.get_hyperprior)
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
                method=MS2020Model.encode_latents,
            )
        )
        _supports = jax.jit(
            lambda p, z: model.apply(
                p, z, method=MS2020Model.supports_from_zhat
            )
        )
        _slice_params = jax.jit(
            lambda i, p, ms, ss, dec: model.apply(
                p, i, ms, ss, dec, method=MS2020Model.slice_params
            ),
            static_argnums=0,
        )
        _slice_lrp = jax.jit(
            lambda i, p, ms, dec: model.apply(
                p, i, ms, dec, method=MS2020Model.slice_lrp
            ),
            static_argnums=0,
        )
        self._encode = lambda x: _encode(self._p, x)
        self._supports = lambda z: _supports(self._p, z)
        self._slice_params = lambda i, ms, ss, dec: _slice_params(
            i, self._p, ms, ss, dec
        )
        self._slice_lrp = lambda i, ms, dec: _slice_lrp(i, self._p, ms, dec)
        # Raw param-taking jits, exposed for the multi-device decoder
        # (parallel/charm_sharded.py): it calls the SAME compiled-function
        # objects with mesh-replicated params + batch-sharded activations,
        # so the sharded slice chain runs the identical math as this codec.
        self._jit_encode = _encode
        self._jit_supports = _supports
        self._jit_slice_params = _slice_params
        # Tiny shared jits for the coder boundary: identical compiled code
        # on the encode and decode side, so symbol/row/reconstruction math
        # can never diverge between them (see bmshj2018.Codec notes).
        self._center_round = jax.jit(
            lambda y, mu: jnp.round(y - mu).astype(jnp.int32)
        )
        self._apply_loc = jax.jit(
            lambda v, mu: v.astype(jnp.float32) + mu
        )
        _finish_slice = jax.jit(
            lambda i, p, ms, dec, y_hat_i: y_hat_i
            + model.apply(
                p, i, ms, dec + [y_hat_i], method=MS2020Model.slice_lrp
            ),
            static_argnums=0,
        )
        self._finish_slice = lambda i, ms, dec, y_hat_i: _finish_slice(
            i, self._p, ms, dec, y_hat_i
        )
        _synthesize = jax.jit(
            lambda p, y: jnp.clip(
                jnp.round(
                    model.apply(p, y, method=MS2020Model.synthesize) * 255.0
                ),
                0,
                255,
            ).astype(jnp.uint8)
        )
        self._synthesize = lambda y: _synthesize(self._p, y)
        self._jit_finish_slice = _finish_slice
        self._jit_synthesize = _synthesize
        # z coder boundary on device: symbols and z_hat formed with the same
        # f32 math the decoder's host path uses (integer symbols + f32
        # offset; IEEE addition is identical on host and device), so the
        # shared _supports jit sees bit-equal z_hat on both sides.
        z_off = self.side_em.symbol_offset()
        self._z_symbols = jax.jit(
            lambda z: jnp.round(z - z_off).astype(jnp.int32)
        )
        self._z_hat = jax.jit(lambda zs: zs.astype(jnp.float32) + z_off)
        s = self.cfg.slice_size
        self._take_slice = lambda y, i: y[..., i * s : (i + 1) * s]

    # -- encode: one async device chain, ONE host sync ----------------------
    #
    # The autoregressive loop has no host dependency on the ENCODE side:
    # every slice's (mu, sigma, symbols, y_hat) is computable on device from
    # x alone. All 10 slices are dispatched asynchronously through the SAME
    # per-slice jits the decoder uses (bit-exactness: identical compiled
    # executables on identical inputs can't diverge by a fused-op ulp), and
    # the host blocks exactly once to fetch all symbols + CDF rows before
    # range coding. The reference's encoder (models/ms2020.py:≈380) blocks
    # on the coder op once per slice.

    def _dispatch_encode(self, images: np.ndarray):
        cfg = self.cfg
        s = cfg.slice_size
        x, (h, w) = image_util.pad_to_multiple_np(
            np.asarray(images, np.uint8), cfg.downscale
        )
        y, z = self._encode(jnp.asarray(x))
        z_sym = self._z_symbols(z)
        z_hat = self._z_hat(z_sym)
        mu_sup, sigma_sup = self._supports(z_hat)
        decoded: List = []
        syms: List = []
        rows: List = []
        for i in range(cfg.num_slices):
            y_i = self._take_slice(y, i)
            mu, sigma = self._slice_params(i, mu_sup, sigma_sup, decoded)
            sym = self._center_round(y_i, mu)
            syms.append(sym)
            rows.append(self.em.rows(sigma))
            y_hat_i = self._apply_loc(sym, mu)
            decoded.append(self._finish_slice(i, mu_sup, decoded, y_hat_i))
        return syms, rows, z_sym, (h, w), z_hat.shape[1:3]

    def _finish_encode(self, work) -> List[bytes]:
        syms, rows, z_sym, hw, zshape = work
        cfg = self.cfg
        # Single blocking fetch of the whole dispatched chain.
        syms, rows, z_sym = jax.device_get((syms, rows, z_sym))
        n = z_sym.shape[0]
        z_strings = self.side_em.compress_symbols(np.asarray(z_sym))
        blobs = []
        slice_strings = [
            self.em.compress_symbols(
                np.asarray(syms[i]).reshape(n, -1),
                np.asarray(rows[i]).reshape(n, -1),
            )
            for i in range(cfg.num_slices)
        ]
        h, w = hw
        for b in range(n):
            packed = PackedTensors()
            packed.model = cfg.model_name
            packed.pack(
                [slice_strings[i][b] for i in range(cfg.num_slices)]
                + [
                    z_strings[b],
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

    def compress_batch(
        self, images: np.ndarray, coder: str = "host"
    ) -> List[bytes]:
        """Batched encode: N images through one dispatched slice chain.

        ``coder="device"`` entropy-codes every slice ON the accelerator
        (K-lane rANS, codec/rans.py): the only y-stream link traffic is
        the compressed words, and the host never sees symbols or CDF
        rows."""
        if coder == "device":
            return self._finish_encode_rans(self._dispatch_encode_rans(images))
        if coder != "host":
            raise ValueError(f"unknown coder {coder!r} (host|device)")
        return self._finish_encode(self._dispatch_encode(images))

    # -- device-coded path (on-TPU rANS; see bmshj2018.Codec notes) ---------
    #
    # CHARM's decode chain is serial over slices, and the HOST-coder
    # version pays that serialization at the link: per slice, a CDF-row
    # fetch, a host range-decode, and a values upload (10 device<->host
    # round trips per batch, each a sync point). With the coder ON the
    # device, every slice step is two async device dispatches — the whole
    # 10-slice chain runs without a single host sync until the final
    # image fetch. Blob format: num_slices+4 fields
    # [slice0..sliceN words, z_string, xshape, zshape, [K]];
    # decompress_batch auto-detects by field count.

    def _rans(self, N: int, K: int | None = None):
        # Shared K heuristic / capacity formula / jit cache: one
        # definition (device_coding.rans_for) for every family writing
        # the device blob format.
        from compression_tpu.models.device_coding import rans_for

        return rans_for(self, N, K)

    def _dispatch_encode_rans(self, images: np.ndarray):
        cfg = self.cfg
        x, (h, w) = image_util.pad_to_multiple_np(
            np.asarray(images, np.uint8), cfg.downscale
        )
        y, z = self._encode(jnp.asarray(x))
        z_sym = self._z_symbols(z)
        z_hat = self._z_hat(z_sym)
        mu_sup, sigma_sup = self._supports(z_hat)
        n = x.shape[0]
        decoded: List = []
        streams: List = []
        K_used = None
        for i in range(cfg.num_slices):
            y_i = self._take_slice(y, i)
            mu, sigma = self._slice_params(i, mu_sup, sigma_sup, decoded)
            sym = self._center_round(y_i, mu)
            N = int(np.prod(sym.shape[1:]))
            enc, _dec, K_used, _cap = self._rans(N)
            rows32 = self.em.rows(sigma).astype(jnp.int32)
            streams.append(
                enc(sym.reshape(n, -1), rows32.reshape(n, -1))
            )
            y_hat_i = self._apply_loc(sym, mu)
            decoded.append(self._finish_slice(i, mu_sup, decoded, y_hat_i))
        return streams, z_sym, (h, w), z_hat.shape[1:3], n, K_used

    def _finish_encode_rans(self, work) -> List[bytes]:
        streams, z_sym, hw, zshape, n, K = work
        cfg = self.cfg
        lengths = jax.device_get([s[1] for s in streams])
        overflow = jax.device_get([s[2] for s in streams])
        if bool(np.any(np.asarray(overflow))):
            raise ValueError(
                "rANS stream capacity exceeded in a CHARM slice "
                "(pathological symbol statistics); use the host coder "
                "for this input"
            )
        z_sym = np.asarray(jax.device_get(z_sym))
        z_strings = self.side_em.compress_symbols(z_sym)
        from compression_tpu.models.device_coding import fetch_streams

        # One device->host transfer per slice (not per image per slice).
        slice_bytes = [
            fetch_streams(streams[i][0], lengths[i])
            for i in range(cfg.num_slices)
        ]
        h, w = hw
        blobs = []
        for b in range(n):
            packed = PackedTensors()
            packed.model = cfg.model_name
            packed.pack(
                [slice_bytes[i][b] for i in range(cfg.num_slices)]
                + [
                    z_strings[b],
                    np.array([h, w], np.int32),
                    np.array(zshape, np.int32),
                    np.array([K], np.int32),
                ]
            )
            blobs.append(packed.string)
        return blobs

    def _is_device_coded(self, blob: bytes) -> bool:
        packed = PackedTensors(blob)
        n_fields = len([k for k, *_ in packed.describe() if k != "MD"])
        return n_fields == self.cfg.num_slices + 4

    def _parse_device_blobs(self, blobs: List[bytes]):
        """Unpacks device-coded blobs; validates format + size uniformity
        (a lockstep batched decode cannot mix formats or image sizes)."""
        cfg = self.cfg
        slice_words: List[List[np.ndarray]] = [
            [] for _ in range(cfg.num_slices)
        ]
        z_strings: List[bytes] = []
        xshape = zshape = None
        K = None
        for b, blob in enumerate(blobs):
            if not self._is_device_coded(blob):
                raise ValueError(
                    f"blob {b} is host-coded; a batched decode cannot "
                    "mix host- and device-coded bitstreams"
                )
            packed = PackedTensors(blob)
            fields = packed.unpack(
                [object] * cfg.num_slices
                + [object, np.int32, np.int32, np.int32]
            )
            for i in range(cfg.num_slices):
                slice_words[i].append(
                    np.frombuffer(bytes(fields[i][0]), np.uint16)
                )
            z_strings.append(bytes(fields[cfg.num_slices][0]))
            xs = fields[cfg.num_slices + 1]
            zsh = fields[cfg.num_slices + 2]
            kk = int(fields[cfg.num_slices + 3][0])
            if xshape is not None and not (
                np.array_equal(xshape, xs)
                and np.array_equal(zshape, zsh)
                and K == kk
            ):
                raise ValueError(
                    "batched decode requires same-size blobs: blob "
                    f"{b} has shape/K {tuple(xs)}/{kk} vs "
                    f"{tuple(xshape)}/{K}; decode mixed sizes one by one"
                )
            xshape, zshape, K = xs, zsh, kk
        return slice_words, z_strings, xshape, zshape, K

    def _decompress_batch_rans(self, blobs: List[bytes]) -> np.ndarray:
        cfg = self.cfg
        n = len(blobs)
        slice_words, z_strings, xshape, zshape, K = self._parse_device_blobs(
            blobs
        )
        z_hat = self.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        mu_sup, sigma_sup = self._supports(z_hat)

        decoded: List = []
        ok_flags = []
        for i in range(cfg.num_slices):
            mu, sigma = self._slice_params(i, mu_sup, sigma_sup, decoded)
            N = int(np.prod(mu.shape[1:]))
            _enc, dec, _K, _cap = self._rans(N, K)
            from compression_tpu.models.device_coding import pad_words

            rows32 = self.em.rows(sigma).astype(jnp.int32)
            values, ok = dec(
                jnp.asarray(pad_words(slice_words[i])),
                rows32.reshape(n, -1),
            )
            ok_flags.append(ok)
            y_hat_i = self._apply_loc(values.reshape(mu.shape), mu)
            decoded.append(self._finish_slice(i, mu_sup, decoded, y_hat_i))

        y_hat = jnp.concatenate(decoded, axis=-1)
        x_hat = self._synthesize(y_hat)
        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))
        x_hat, ok_flags = jax.device_get((x_hat, ok_flags))
        if not bool(np.all(np.asarray(ok_flags))):
            raise ValueError("corrupt device-coded bitstream (rANS state)")
        return np.asarray(x_hat, np.uint8)

    def compress_iter(self, batches, depth: int = 2, coder: str = "host"):
        """Pipelined encode over batches: the device runs batch i+1's slice
        chain while host threads range-code batch i (10 streams/img).
        ``coder="device"`` replaces the host coding stage with on-TPU rANS
        (the finish stage then only fetches compressed words)."""
        from compression_tpu.parallel.pipeline import Pipeline

        if coder == "device":
            dispatch, finish = self._dispatch_encode_rans, self._finish_encode_rans
        elif coder == "host":
            dispatch, finish = self._dispatch_encode, self._finish_encode
        else:
            raise ValueError(f"unknown coder {coder!r} (host|device)")
        yield from Pipeline(dispatch, finish, depth).run(batches)

    # -- decode: slice-batched across images ---------------------------------
    #
    # The CHARM decode is inherently serial per image: slice i+1's (mu,
    # sigma) depend on slice i's *decoded* values, so the device genuinely
    # cannot start slice i+1 before the host coder finishes slice i
    # (SURVEY.md §3.3). What CAN be removed is the per-image multiplier:
    # decoding N images in lockstep turns 10 device<->host round-trips per
    # IMAGE into 10 per BATCH, and `decompress_iter` (depth 2) fills each
    # remaining host-coding gap with the next batch's device work.

    def _parse_blobs(self, blobs: List[bytes]):
        cfg = self.cfg
        slice_strings: List[List[bytes]] = [[] for _ in range(cfg.num_slices)]
        z_strings: List[bytes] = []
        xshape = zshape = None
        for b, blob in enumerate(blobs):
            if self._is_device_coded(blob):
                raise ValueError(
                    f"blob {b} is device-coded; a batched decode cannot "
                    "mix host- and device-coded bitstreams"
                )
            packed = PackedTensors(blob)
            fields = packed.unpack(
                [object] * cfg.num_slices + [object, np.int32, np.int32]
            )
            for i in range(cfg.num_slices):
                slice_strings[i].append(bytes(fields[i][0]))
            z_strings.append(bytes(fields[cfg.num_slices][0]))
            xs = fields[cfg.num_slices + 1]
            zsh = fields[cfg.num_slices + 2]
            if xshape is not None and not (
                np.array_equal(xshape, xs) and np.array_equal(zshape, zsh)
            ):
                raise ValueError(
                    "batched decode requires same-size blobs: blob "
                    f"{b} has shape {tuple(xs)} vs {tuple(xshape)}; "
                    "decode mixed sizes one by one"
                )
            xshape, zshape = xs, zsh
        return slice_strings, z_strings, xshape, zshape

    def decompress_batch(self, blobs: List[bytes]) -> np.ndarray:
        """Decodes same-size .tfci blobs as one lockstep slice-batched pass
        (host- or device-coded format, auto-detected)."""
        if self._is_device_coded(blobs[0]):
            return self._decompress_batch_rans(blobs)
        cfg = self.cfg
        slice_strings, z_strings, xshape, zshape = self._parse_blobs(blobs)
        n = len(blobs)
        z_hat = self.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        mu_sup, sigma_sup = self._supports(z_hat)

        decoded: List = []
        for i in range(cfg.num_slices):
            mu, sigma = self._slice_params(i, mu_sup, sigma_sup, decoded)
            rows = np.asarray(jax.device_get(self.em.rows(sigma)))
            values = self.em.decode_symbols(
                slice_strings[i], rows.reshape(n, -1)
            )
            y_hat_i = self._apply_loc(
                jnp.asarray(self._slim(values.reshape(mu.shape))), mu
            )
            decoded.append(self._finish_slice(i, mu_sup, decoded, y_hat_i))

        y_hat = jnp.concatenate(decoded, axis=-1)
        x_hat = self._synthesize(y_hat)
        x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))
        return np.asarray(jax.device_get(x_hat), np.uint8)

    @staticmethod
    def _slim(values: np.ndarray) -> np.ndarray:
        from compression_tpu.util.numeric import slim_int

        return slim_int(values)

    def decompress_iter(self, blob_batches, depth: int = 2):
        """Decodes an iterable of blob lists with ``depth`` batches in
        flight on worker threads: while the host range-decodes batch i's
        slice j, the device computes another batch's slice parameters (the
        only overlap the serial CHARM chain admits within a chip)."""
        from compression_tpu.parallel.pipeline import staggered_map

        yield from staggered_map(self.decompress_batch, blob_batches, depth)

    def decompress(self, data: bytes) -> np.ndarray:
        return self.decompress_batch([data])[0]


def make_codec(model: MS2020Model, params) -> Codec:
    from compression_tpu.models.codec_cache import cached

    return cached(params, lambda: Codec(model, params))


def compress(
    model: MS2020Model, params, image: np.ndarray, coder: str = "host"
) -> bytes:
    return make_codec(model, params).compress(image, coder)


def decompress(model: MS2020Model, params, data: bytes) -> np.ndarray:
    return make_codec(model, params).decompress(data)


# ---------------------------------------------------------------------------
# Spatially sharded transforms (images too large for one chip's HBM)
# ---------------------------------------------------------------------------
#
# CHARM shares the flagship's analysis/synthesis classes; its hyper pair
# and per-slice nets are stride-1/2 SignalConv stacks, so every compute
# stage of a CHARM decode shards spatially with the same halo machinery —
# the sequential slice chain (a data dependency) and the entropy coding
# stay the driver's job, exactly as in the single-device codec.

_SLICE_LAYERS = [
    {"name": "conv0", "down": 1, "post": "relu"},
    {"name": "conv1", "down": 1, "post": "relu"},
    {"name": "conv2", "down": 1},
]


def sharded_analyze(model: MS2020Model, params, x, mesh, axis="data"):
    """H-sharded analysis: x -> y (H divisible by mesh size * 16)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["analysis"]
    x = jnp.asarray(x, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(p, x, mesh, axis, _b._ANALYSIS_LAYERS)


def sharded_synthesize(model: MS2020Model, params, y_hat, mesh,
                       axis="data"):
    """H-sharded synthesis: y_hat -> x_hat."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["synthesis"]
    y = jnp.asarray(y_hat, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(p, y, mesh, axis, _b._SYNTHESIS_LAYERS)


def sharded_hyper_analyze(model: MS2020Model, params, y, mesh, axis="data"):
    """H-sharded hyper-analysis: y -> z (signed input, paper widths)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    p = params["params"]["hyper_analysis"]
    y = jnp.asarray(y, p["conv0"]["kernel"].dtype)
    return sharded_transform_apply(
        p, y, mesh, axis, _b._HYPER_ANALYSIS_LAYERS
    )


def sharded_supports(model: MS2020Model, params, z_hat, mesh, axis="data"):
    """H-sharded support transforms: z_hat -> (mu_support, sigma_support)."""
    from compression_tpu.models import bmshj2018 as _b
    from compression_tpu.parallel.spatial import sharded_transform_apply

    z = jnp.asarray(
        z_hat, params["params"]["mean_support"]["conv0"]["kernel"].dtype
    )
    return tuple(
        sharded_transform_apply(
            params["params"][name], z, mesh, axis,
            _b._HYPER_SYNTHESIS_LAYERS,
        )
        for name in ("mean_support", "scale_support")
    )


def sharded_slice_params(model: MS2020Model, params, i: int, mu_sup,
                         sigma_sup, decoded, mesh, axis="data"):
    """H-sharded per-slice (mu_i, sigma_i) — the sharded twin of
    ``MS2020Model.slice_params`` (same context capping)."""
    from compression_tpu.parallel.spatial import sharded_transform_apply

    m = model.config.max_support_slices
    support = list(decoded) if m < 0 else list(decoded[:m])
    ctx = jnp.concatenate([mu_sup] + support, axis=-1)
    mu = sharded_transform_apply(
        params["params"][f"mean_t{i}"], ctx, mesh, axis, _SLICE_LAYERS
    )
    ctx_s = jnp.concatenate([sigma_sup] + support, axis=-1)
    sigma = lower_bound(
        sharded_transform_apply(
            params["params"][f"scale_t{i}"], ctx_s, mesh, axis,
            _SLICE_LAYERS,
        ),
        SCALES_MIN,
    )
    return mu, sigma


def sharded_slice_lrp(model: MS2020Model, params, i: int, mu_sup,
                      decoded_with_current, mesh, axis="data"):
    """H-sharded latent residual prediction — twin of
    ``MS2020Model.slice_lrp``."""
    from compression_tpu.parallel.spatial import sharded_transform_apply

    m = model.config.max_support_slices
    prior = list(decoded_with_current[:-1])
    support = prior if m < 0 else prior[:m]
    ctx = jnp.concatenate(
        [mu_sup] + support + list(decoded_with_current[-1:]), axis=-1
    )
    return 0.5 * jnp.tanh(
        sharded_transform_apply(
            params["params"][f"lrp_t{i}"], ctx, mesh, axis, _SLICE_LAYERS
        )
    )


def sharded_encode_latents(model: MS2020Model, params, x, mesh,
                           axis="data"):
    """The full encode front (x -> y -> z) H-sharded over the mesh
    (H divisible by mesh size * 64)."""
    y = sharded_analyze(model, params, x, mesh, axis)
    z = sharded_hyper_analyze(model, params, y, mesh, axis)
    return y, z


class SpatialCodec:
    """Giant-image CHARM codec: one image, every compute stage H-sharded.

    The flagship-family counterpart of ``bmshj2018.SpatialCodec``:
    analysis, hyper-analysis, the two support transforms, all per-slice
    (mu, sigma)/LRP nets and the synthesis run halo-sharded across the
    mesh; the sequential 10-slice chain and the host entropy coding stay
    the driver, exactly as in the single-device codec. Wire format is the
    standard (num_slices + 3)-field blob. Bit-exactness invariant: encode
    and decode share ONE compiled sharded program per stage (supports,
    per-slice params+rows, per-slice LRP finish), and the coder-boundary
    math reuses the dense codec's trivially-jitted kernels — the two
    sides can never disagree on a symbol or CDF row.
    """

    def __init__(self, model: MS2020Model, params, mesh, axis="data"):
        self.codec = make_codec(model, params)
        cfg = self.cfg = model.config
        self.mesh, self.axis = mesh, axis
        self._p = params
        nd = mesh.shape[axis]
        self._mult = cfg.downscale * nd
        em = self.codec.em
        z_off = self.codec.side_em.symbol_offset()
        self._z_off_host = np.asarray(z_off, np.float32)

        def _front(p, x_uint8):
            x = x_uint8.astype(jnp.float32) / 255.0
            y = sharded_analyze(model, p, x, mesh, axis)
            z = sharded_hyper_analyze(model, p, y, mesh, axis)
            return y, jnp.round(z - z_off).astype(jnp.int32)

        def _slice_pr(i, p, ms, ss, dec):
            mu, sigma = sharded_slice_params(
                model, p, i, ms, ss, dec, mesh, axis
            )
            return mu, em.rows(sigma)

        self._front = jax.jit(_front)
        self._sup = jax.jit(
            lambda p, z_hat: sharded_supports(model, p, z_hat, mesh, axis)
        )
        self._slice_pr = jax.jit(_slice_pr, static_argnums=0)
        self._fin = jax.jit(
            lambda i, p, ms, dec, y_hat_i: y_hat_i
            + sharded_slice_lrp(
                model, p, i, ms, dec + [y_hat_i], mesh, axis
            ),
            static_argnums=0,
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
        cfg, codec = self.cfg, self.codec
        x = np.asarray(image, np.uint8)[None]
        h, w = x.shape[1], x.shape[2]
        hp, wp = -h % self._mult, -w % cfg.downscale
        if hp or wp:
            x = np.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge")
        y, z_sym = self._front(self._p, jnp.asarray(x))
        z_sym = np.asarray(jax.device_get(z_sym))
        z_hat = jnp.asarray(z_sym.astype(np.float32) + self._z_off_host)
        mu_sup, sigma_sup = self._sup(self._p, z_hat)
        decoded, syms, rows = [], [], []
        for i in range(cfg.num_slices):
            y_i = codec._take_slice(y, i)
            mu, rows_i = self._slice_pr(i, self._p, mu_sup, sigma_sup, decoded)
            sym = codec._center_round(y_i, mu)
            syms.append(sym)
            rows.append(rows_i)
            y_hat_i = codec._apply_loc(sym, mu)
            decoded.append(self._fin(i, self._p, mu_sup, decoded, y_hat_i))
        syms, rows = jax.device_get((syms, rows))
        z_strings = codec.side_em.compress_symbols(z_sym)
        slice_strings = [
            codec.em.compress_symbols(
                np.asarray(syms[i]).reshape(1, -1),
                np.asarray(rows[i]).reshape(1, -1),
            )[0]
            for i in range(cfg.num_slices)
        ]
        packed = PackedTensors()
        packed.model = cfg.model_name
        packed.pack(
            slice_strings
            + [
                z_strings[0],
                np.array([h, w], np.int32),
                np.array(z_sym.shape[1:3], np.int32),
            ]
        )
        return packed.string

    def decompress(self, blob: bytes) -> np.ndarray:
        cfg, codec = self.cfg, self.codec
        slice_strings, z_strings, xshape, zshape = codec._parse_blobs([blob])
        z_hat = codec.side_em.decompress(
            z_strings, tuple(int(v) for v in zshape)
        )
        mu_sup, sigma_sup = self._sup(self._p, jnp.asarray(z_hat))
        decoded = []
        for i in range(cfg.num_slices):
            mu, rows = self._slice_pr(i, self._p, mu_sup, sigma_sup, decoded)
            rows = np.asarray(jax.device_get(rows))
            values = codec.em.decode_symbols(
                slice_strings[i], rows.reshape(1, -1)
            )
            y_hat_i = codec._apply_loc(
                jnp.asarray(codec._slim(values.reshape(mu.shape))), mu
            )
            decoded.append(self._fin(i, self._p, mu_sup, decoded, y_hat_i))
        y_hat = jnp.concatenate(decoded, axis=-1)
        x_hat = np.asarray(
            jax.device_get(self._synth(self._p, y_hat))
        )
        return x_hat[0, : int(xshape[0]), : int(xshape[1]), :]
