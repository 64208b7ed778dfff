"""Power-law entropy model (model-weight compression).

Re-design of PowerLawEntropyModel (reference:
tensorflow_compression/python/entropy_models/power_law.py:1-160): a
*prior-free* entropy model whose training penalty is the closed-form code
length of a power-law integer code, and whose actual coding is the native
run-length + Elias-gamma coder (no CDF tables, no trained state). Used for
entropy-penalized model weights, not for image latents.

Penalty (this framework's spec): per element,

    bits(x) = 2 * log2(|x| + alpha) - 2 * log2(alpha)

which is ~0 at x = 0 and tracks the Elias-gamma length 2*floor(log2 m) + 1
for magnitudes m >= 1 when alpha = 1 (the default).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import host as codec

__all__ = ["PowerLawEntropyModel"]


class PowerLawEntropyModel:
    def __init__(self, coding_rank: int, alpha: float = 1.0):
        if alpha <= 0:
            raise ValueError("alpha must be positive")
        self.coding_rank = int(coding_rank)
        self.alpha = float(alpha)

    def penalty(self, x):
        """Differentiable code-length penalty in bits, per coding unit."""
        x = jnp.asarray(x)
        bits = 2.0 * (
            jnp.log2(jnp.abs(x) + self.alpha) - jnp.log2(jnp.asarray(self.alpha))
        )
        return jnp.sum(
            bits, axis=tuple(range(x.ndim - self.coding_rank, x.ndim))
        )

    def __call__(self, x):
        return self.penalty(x)

    def quantize(self, x):
        from compression_tpu.ops.round_ops import round_st

        return round_st(x)

    def compress(self, x) -> List[bytes]:
        """Rounds and codes; one stream per leading-batch element."""
        arr = np.asarray(jax.device_get(x))
        symbols = np.round(arr).astype(np.int32)
        lead = symbols.shape[: symbols.ndim - self.coding_rank]
        flat = symbols.reshape((int(np.prod(lead)) if lead else 1, -1))
        return [codec.run_length_gamma_encode(row) for row in flat]

    def decompress(self, strings: List[bytes], shape: Sequence[int]):
        """``shape`` is the FULL output shape (leading batch dims included);
        its trailing ``coding_rank`` dims are one coding unit. Unambiguous
        for batch size 1: pass (1, *unit) to get the batch dim back."""
        shape = tuple(shape)
        unit = shape[len(shape) - self.coding_rank :]
        lead = shape[: len(shape) - self.coding_rank]
        n = int(np.prod(lead)) if lead else 1
        if n != len(strings):
            raise ValueError(
                f"shape {shape} implies {n} streams, got {len(strings)}"
            )
        rows = [
            np.asarray(codec.run_length_gamma_decode(s, unit))
            for s in strings
        ]
        out = np.stack(rows).astype(np.float32).reshape(shape)
        return jnp.asarray(out)
