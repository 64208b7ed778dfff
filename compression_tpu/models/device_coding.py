"""Shared device-coded (on-TPU rANS) paths for mean-scale hyperprior codecs.

mbt2018 and HiFiC share the two-stream mean-scale structure: z factorized,
y coded as ``round(y - mu)`` against sigma-indexed tables. This module
gives their Codec objects the device-coded product mode (see
codec/rans_ref.py for why this exists): symbols and CDF rows never leave
the device — the y stream is entropy-coded by K-lane rANS on the
accelerator and only compressed words cross the link.

Duck-typed against the codec objects (all of: ``_encode``, ``_z_symbols``,
``_z_hat``, ``_params``, ``_center_round``, ``_apply_loc``,
``_synthesize``, ``em``, ``side_em``, ``cfg.model_name``,
``cfg.downscale``). Blob format: 5 fields
``[y_rans_words, z_string, xshape, zshape, [K]]`` — host-coded blobs have
4, so decompress auto-detects.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util

__all__ = [
    "rans_for",
    "is_device_coded",
    "parse_host_blobs",
    "fetch_streams",
    "pad_words",
    "dispatch_encode_rans",
    "finish_encode_rans",
    "decompress_batch_rans",
]


def rans_for(codec, N: int, K: int | None = None):
    """(enc, dec, K, cap) for ``codec.em``'s tables, cached on the codec."""
    if not hasattr(codec, "_rans_cache"):
        codec._rans_cache = {}
    if K is None:
        # TPC_RANS_K is a CAP on the auto-fit lane count (and is honored
        # all the way down to 1 — single-lane runs are the debugging /
        # reference-comparison mode). Lane count stays a power of two.
        cap_k = max(1, int(os.environ.get("TPC_RANS_K", "128")))
        k_fit = 1
        while k_fit * 2 <= max(4, N // 16) and k_fit * 2 <= cap_k:
            k_fit *= 2
        K = k_fit
    key = (N, K)
    if key not in codec._rans_cache:
        from compression_tpu.codec import rans

        cap = 3 * N + 2 * K + 64
        enc = jax.jit(rans.make_rans_encoder(codec.em.tables, K, cap))
        dec = jax.jit(rans.make_rans_decoder(codec.em.tables, K, N))
        codec._rans_cache[key] = (enc, dec, K, cap)
    return codec._rans_cache[key]


def is_device_coded(blob: bytes) -> bool:
    packed = PackedTensors(blob)
    return len([k for k, *_ in packed.describe() if k != "MD"]) == 5


def parse_host_blobs(blobs: List[bytes]):
    """Unpacks host-coded 4-field blobs ``[y_string, z_string, xshape,
    zshape]`` with format/size-uniformity validation (a lockstep batched
    decode cannot mix coder formats or image sizes)."""
    y_strings, z_strings = [], []
    xshape = zshape = None
    for b, blob in enumerate(blobs):
        if is_device_coded(blob):
            raise ValueError(
                f"blob {b} is device-coded; a batched decode cannot mix "
                "host- and device-coded bitstreams"
            )
        packed = PackedTensors(blob)
        ys, zs, xs, zsh = packed.unpack(
            [object, object, np.int32, np.int32]
        )
        y_strings.append(bytes(ys[0]))
        z_strings.append(bytes(zs[0]))
        if xshape is not None and not (
            np.array_equal(xshape, xs) and np.array_equal(zshape, zsh)
        ):
            raise ValueError(
                "batched decode requires same-size blobs: blob "
                f"{b} has shape {tuple(xs)} vs {tuple(xshape)}; "
                "decode mixed sizes one by one"
            )
        xshape, zshape = xs, zsh
    return y_strings, z_strings, xshape, zshape


def fetch_streams(stream, lengths) -> List[bytes]:
    """Fetches per-image rANS word streams in ONE device->host transfer.

    ``stream`` is the [n, cap] device buffer, ``lengths`` the (already
    fetched) per-image word counts. Slicing to the batch max and fetching
    once costs n*max(len) words instead of sum(len) — a few 10s of percent
    more bytes — but a single link round-trip instead of n; on a
    high-latency link (the benched tunnel) latency dominates, and on PCIe
    one dispatch is still cheaper than n."""
    lengths = np.asarray(lengths)
    n = stream.shape[0]
    max_len = int(lengths.max()) if n else 0
    flat = np.asarray(jax.device_get(stream[:, :max_len]))
    return [flat[b, : int(lengths[b])].tobytes() for b in range(n)]


def pad_words(word_lists) -> np.ndarray:
    """Pads per-image u16 rANS word streams into one [n, cap] array, cap
    rounded up to a power-of-two bucket so varying stream lengths reuse a
    handful of compiled decode programs."""
    cap = 1024
    longest = max(len(w) for w in word_lists)
    while cap < longest:
        cap *= 2
    out = np.zeros((len(word_lists), cap), np.uint16)
    for b, w in enumerate(word_lists):
        out[b, : len(w)] = w
    return out


def dispatch_encode_rans(codec, images: np.ndarray):
    """Device stage: transforms + symbols + rows + rANS, all async."""
    x, hw = image_util.pad_to_multiple_np(
        np.asarray(images, np.uint8), codec.cfg.downscale
    )
    # Codecs whose _encode front takes normalized floats provide a uint8
    # variant under _encode_u8 (HiFiC); the hyperprior codecs' _encode is
    # already uint8-in.
    encode = getattr(codec, "_encode_u8", codec._encode)
    y, z = encode(jnp.asarray(x))
    z_sym = codec._z_symbols(z)
    z_hat = codec._z_hat(z_sym)
    mu, sigma = codec._params(z_hat)
    sym = codec._center_round(y, mu)
    n = x.shape[0]
    N = int(np.prod(sym.shape[1:]))
    enc, _dec, K, _cap = rans_for(codec, N)
    rows32 = codec.em.rows(sigma).astype(jnp.int32)
    stream, lengths, overflow = enc(
        sym.reshape(n, -1), rows32.reshape(n, -1)
    )
    return (stream, lengths, overflow, z_sym, hw, z_hat.shape[1:3], n, K)


def finish_encode_rans(codec, work) -> List[bytes]:
    stream, lengths, overflow, z_sym, hw, zshape, n, K = work
    lengths, overflow, z_sym = jax.device_get((lengths, overflow, z_sym))
    if bool(np.any(np.asarray(overflow))):
        raise ValueError(
            "rANS stream capacity exceeded (pathological symbol "
            "statistics); use the host coder for this input"
        )
    z_strings = codec.side_em.compress_symbols(np.asarray(z_sym, np.int32))
    h, w = hw
    blobs = []
    words_all = fetch_streams(stream, lengths)
    for b in range(n):
        words = words_all[b]
        packed = PackedTensors()
        packed.model = codec.cfg.model_name
        packed.pack(
            [
                words,
                z_strings[b],
                np.array([h, w], np.int32),
                np.array(zshape, np.int32),
                np.array([K], np.int32),
            ]
        )
        blobs.append(packed.string)
    return blobs


def decompress_batch_rans(codec, blobs: List[bytes]) -> np.ndarray:
    y_words, z_strings = [], []
    xshape = zshape = None
    K = None
    for b, blob in enumerate(blobs):
        if not is_device_coded(blob):
            raise ValueError(
                f"blob {b} is host-coded; a batched decode cannot mix "
                "host- and device-coded bitstreams"
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
                f"{tuple(xshape)}/{K}; decode mixed sizes one by one"
            )
        xshape, zshape, K = xs, zsh, int(kk[0])
    n = len(blobs)
    z_hat = codec.side_em.decompress(
        z_strings, tuple(int(v) for v in zshape)
    )
    mu, sigma = codec._params(z_hat)
    N = int(np.prod(mu.shape[1:]))
    _enc, dec, _K, _cap = rans_for(codec, N, K)
    stream = pad_words(y_words)
    rows32 = codec.em.rows(sigma).astype(jnp.int32)
    values, ok = dec(jnp.asarray(stream), rows32.reshape(n, -1))
    y_hat = codec._apply_loc(values.reshape(mu.shape), mu)
    x_hat = codec._synthesize(y_hat)
    x_hat = image_util.unpad(x_hat, (int(xshape[0]), int(xshape[1])))
    x_hat, ok = jax.device_get((x_hat, ok))
    if not bool(np.all(np.asarray(ok))):
        raise ValueError("corrupt device-coded bitstream (rANS state)")
    return np.asarray(x_hat, np.uint8)
