"""Padding helpers for `same`-style convolutions.

TPU-native re-implementation of the reference padding helper (reference:
tensorflow_compression/python/ops/padding_ops.py:1-60).

Conventions (this framework's documented spec — also the spec implemented by
the NumPy golden model in tests/test_signal_conv.py):

* A *correlation* kernel of length ``k`` is anchored at center index
  ``c = (k - 1) // 2``; a *convolution* (flipped) kernel at ``c = k // 2``.
* "Same" output sample ``o`` is aligned with input position ``o`` (in the
  possibly upsampled grid), so the required padding is ``(c, k - 1 - c)``.

For odd kernels this matches TF/XLA "SAME". For even kernels, correlation
pads one more sample on the right, convolution one more on the left.
"""

from __future__ import annotations

from typing import Sequence, Tuple

__all__ = ["same_padding_for_kernel"]


def same_padding_for_kernel(
    shape: Sequence[int],
    corr: bool,
    strides_up: Sequence[int] | None = None,
) -> Tuple[Tuple[int, int], ...]:
    """Padding (per spatial dim) for a centered "same" convolution.

    Args:
      shape: spatial support of the kernel (no channel dims).
      corr: True for cross-correlation, False for convolution (flipped
        kernel).
      strides_up: upsampling factors. Padding is returned in units of the
        *upsampled* grid (the grid the kernel slides over); pass ``None`` or
        all-ones when not upsampling.

    Returns:
      Tuple of ``(pad_lo, pad_hi)`` per spatial dimension.
    """
    del strides_up  # Padding is defined on the upsampled grid directly.
    padding = []
    for k in shape:
        if k < 1:
            raise ValueError(f"Kernel support must be >= 1, got {k}.")
        c = (k - 1) // 2 if corr else k // 2
        padding.append((c, k - 1 - c))
    return tuple(padding)
