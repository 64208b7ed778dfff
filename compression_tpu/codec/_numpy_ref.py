"""Pure-NumPy reference implementation of the codec bitstream format.

This module is the executable *specification* for the C++ library in
``codec/cc`` (which is the production implementation): both must produce
bit-identical streams. Tests fuzz encode/decode across the two.

Format: see codec/cc/tpc_codec.cc (normative comments) — LZMA-style
carry-counting range coder, escape symbol + Elias-gamma overflow, and the
run-length gamma coder.
"""

from __future__ import annotations

import numpy as np

_TOP = 1 << 24
_MASK32 = 0xFFFFFFFF


class RefRangeEncoder:
    def __init__(self):
        self.out = bytearray()
        self.low = 0
        self.range = _MASK32
        self.cache = 0
        self.cache_size = 1

    def _shift_low(self):
        # Direct transcription of RangeEncoder::ShiftLow in range_coder.h:
        # low is a 33-bit-live accumulator; `(uint32)low << 8` keeps only the
        # low 24 bits shifted up (the dropped byte went to cache/pending).
        if (self.low >> 32) != 0 or (self.low & _MASK32) < 0xFF000000:
            carry = (self.low >> 32) & 0xFF
            byte = self.cache
            while True:
                self.out.append((byte + carry) & 0xFF)
                byte = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = ((self.low & _MASK32) << 8) & _MASK32

    def encode(self, cum: int, freq: int, precision: int):
        r = self.range >> precision
        self.low += r * cum
        self.range = r * freq
        while self.range < _TOP:
            self._shift_low()
            self.range = (self.range << 8) & _MASK32

    def encode_bit(self, bit: int):
        self.encode(bit & 1, 1, 1)

    def finalize(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class RefRangeDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.code = 0
        self.range = _MASK32
        self.r = 0
        for _ in range(5):
            self.code = ((self.code << 8) | self._next_byte()) & _MASK32

    def _next_byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0

    def decode_freq(self, precision: int) -> int:
        self.r = self.range >> precision
        f = self.code // self.r
        return min(f, (1 << precision) - 1)

    def update(self, cum: int, freq: int):
        self.code = (self.code - self.r * cum) & _MASK32
        self.range = (self.r * freq) & _MASK32
        while self.range < _TOP:
            self.code = ((self.code << 8) | self._next_byte()) & _MASK32
            self.range = (self.range << 8) & _MASK32

    def decode_bit(self) -> int:
        f = self.decode_freq(1)
        self.update(f, 1)
        return f


def _encode_gamma(enc: RefRangeEncoder, value: int):
    n = value.bit_length() - 1
    for _ in range(n):
        enc.encode_bit(0)
    for i in range(n, -1, -1):
        enc.encode_bit((value >> i) & 1)


def _decode_gamma(dec: RefRangeDecoder) -> int:
    n = 0
    while dec.decode_bit() == 0:
        n += 1
        if n > 62:
            raise ValueError("corrupt gamma code")
    value = 1
    for _ in range(n):
        value = (value << 1) | dec.decode_bit()
    return value


def entropy_encode(values, indexes, cdfs, cdf_lengths, cdf_offsets, precision):
    """Encodes one stream. All args are 1-D/2-D numpy int arrays."""
    values = np.asarray(values, np.int64).ravel()
    indexes = np.asarray(indexes, np.int64).ravel()
    enc = RefRangeEncoder()
    for v, idx in zip(values, indexes):
        row = cdfs[idx]
        length = int(cdf_lengths[idx])
        escape = length - 2
        s = int(v) - int(cdf_offsets[idx])
        if 0 <= s < escape:
            enc.encode(int(row[s]), int(row[s + 1] - row[s]), precision)
        else:
            enc.encode(
                int(row[escape]), int(row[escape + 1] - row[escape]), precision
            )
            e = 2 * (s - escape) if s >= escape else 2 * (-s) - 1
            _encode_gamma(enc, e + 1)
    return enc.finalize()


def entropy_decode(data, indexes, cdfs, cdf_lengths, cdf_offsets, precision):
    indexes = np.asarray(indexes, np.int64).ravel()
    dec = RefRangeDecoder(data)
    out = np.zeros(indexes.shape, np.int64)
    for k, idx in enumerate(indexes):
        row = cdfs[idx]
        length = int(cdf_lengths[idx])
        escape = length - 2
        f = dec.decode_freq(precision)
        s = int(np.searchsorted(row[:length], f, side="right")) - 1
        dec.update(int(row[s]), int(row[s + 1] - row[s]))
        if s == escape:
            e = _decode_gamma(dec) - 1
            s = escape + e // 2 if e % 2 == 0 else -((e + 1) // 2)
        out[k] = s + int(cdf_offsets[idx])
    return out.astype(np.int32)


def pmf_to_quantized_cdf(pmf, precision: int):
    """Reference CDF quantization (see C++ docs). pmf: 1-D float array."""
    pmf = np.asarray(pmf, np.float64)
    n = pmf.shape[0]
    total_target = 1 << precision
    prob = np.where(np.isfinite(pmf) & (pmf > 0), pmf, 0.0)
    s = prob.sum()
    if s <= 0:
        prob = np.ones(n)
        s = float(n)
    q = np.maximum(1, np.round(prob / s * total_target)).astype(np.int64)
    total = int(q.sum())
    while total != total_target:
        if total < total_target:
            gain = prob * np.log((q + 1.0) / q)
            best = int(np.argmax(gain))
            q[best] += 1
            total += 1
        else:
            loss = np.where(q > 1, prob * np.log(q / np.maximum(q - 1.0, 1e-300)), np.inf)
            best = int(np.argmin(loss))
            if not np.isfinite(loss[best]):
                raise ValueError("cannot reduce CDF below one per symbol")
            q[best] -= 1
            total -= 1
    cdf = np.zeros(n + 1, np.int32)
    cdf[1:] = np.cumsum(q)
    return cdf
