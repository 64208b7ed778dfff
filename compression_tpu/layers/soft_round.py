"""Thin module wrappers for the rounding ops.

Reference: tensorflow_compression/python/layers/soft_round.py:1-110. In this
framework the ops themselves (compression_tpu.ops.round_ops) are the primary
API; these parameter-free flax modules exist so transforms can be composed
as module sequences.
"""

from __future__ import annotations

import flax.linen as nn

from compression_tpu.ops import round_ops

__all__ = ["Round", "SoftRound", "SoftRoundConditionalMean"]


class Round(nn.Module):
    """Hard rounding with straight-through gradients."""

    @nn.compact
    def __call__(self, x):
        return round_ops.round_st(x)


class SoftRound(nn.Module):
    """Invertible soft rounding (inverse=True applies the inverse map)."""

    alpha: float = 5.0
    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        if self.inverse:
            return round_ops.soft_round_inverse(x, self.alpha)
        return round_ops.soft_round(x, self.alpha)


class SoftRoundConditionalMean(nn.Module):
    """Decoder-side conditional-mean reconstruction for soft rounding."""

    alpha: float = 5.0

    @nn.compact
    def __call__(self, x):
        return round_ops.soft_round_conditional_mean(x, self.alpha)
