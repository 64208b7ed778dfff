"""Image IO and quality metrics (PSNR, MS-SSIM).

The reference relies on TF ops for PNG IO and `tf.image.ssim_multiscale`
for evaluation (reference: models/bmshj2018.py eval path); here IO goes
through PIL (host side) and the metrics are pure JAX, jit/vmap-able, so a
whole eval batch runs in one compiled call on the TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "read_png",
    "write_png",
    "pad_to_multiple",
    "pad_to_multiple_np",
    "unpad",
    "psnr",
    "ssim",
    "msssim",
]


def read_png(path) -> np.ndarray:
    """Reads an image file to uint8 (H, W, 3)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.uint8)


def write_png(path, image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(image, np.uint8)).save(path)


def pad_to_multiple(x, multiple: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Pads spatial dims (axes -3, -2) up to a multiple; returns (x, (H, W))."""
    h, w = x.shape[-3], x.shape[-2]
    hp = -h % multiple
    wp = -w % multiple
    pad = [(0, 0)] * x.ndim
    pad[-3] = (0, hp)
    pad[-2] = (0, wp)
    return jnp.pad(x, pad, mode="edge"), (h, w)


def pad_to_multiple_np(
    images: np.ndarray, multiple: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Host-side (NumPy) twin of :func:`pad_to_multiple` for batched
    (N, H, W, C) uint8 images — used by the codec dispatch stages, which
    pad BEFORE the host->device upload so the device program has static
    shapes. Same edge-pad semantics; returns (padded, (H, W))."""
    h, w = images.shape[1], images.shape[2]
    hp, wp = -h % multiple, -w % multiple
    if hp or wp:
        images = np.pad(
            images, ((0, 0), (0, hp), (0, wp), (0, 0)), mode="edge"
        )
    return images, (h, w)


def unpad(x, shape: Sequence[int]):
    h, w = shape
    return x[..., :h, :w, :]


def psnr(a, b, max_val: float = 255.0):
    """PSNR over the trailing (H, W, C) dims."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val**2 / mse)


def _fspecial_gauss(size: int, sigma: float):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return g


def _filter2(x, win):
    """Separable 2-D blur, valid padding; x: (N, H, W, C).

    Precision.HIGHEST is load-bearing: on TPU the default conv precision is
    bfloat16 MXU passes, and the SSIM variance term E[x^2] - mu^2 cancels
    catastrophically under it (observed: msssim 1.0037 / hard 0.0 rows in
    results/synthetic before the fix)."""
    c = x.shape[-1]
    k = win.shape[0]
    kernel_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kernel_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kernel_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, c), ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel_w, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )


def _ssim_per_scale(a, b, max_val, filter_size=11, filter_sigma=1.5,
                    k1=0.01, k2=0.03):
    # SSIM is invariant to jointly rescaling (a, b, max_val); dividing
    # through by max_val keeps E[x^2] near 1 so the float32 variance
    # cancellation stays ~1e-7 instead of ~1e-2 at 255-scale.
    a = a * (1.0 / max_val)
    b = b * (1.0 / max_val)
    c1 = k1 ** 2
    c2 = k2 ** 2
    win = _fspecial_gauss(filter_size, filter_sigma)
    mu_a = _filter2(a, win)
    mu_b = _filter2(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2(a * a, win) - mu_aa
    sigma_bb = _filter2(b * b, win) - mu_bb
    sigma_ab = _filter2(a * b, win) - mu_ab
    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    lum = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    return jnp.mean(lum * cs, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def ssim(a, b, max_val: float = 255.0):
    """Single-scale SSIM; inputs (N, H, W, C) or (H, W, C)."""
    a, b, squeeze = _as_batch(a), _as_batch(b), jnp.ndim(a) == 3
    s, _ = _ssim_per_scale(a, b, max_val)
    return s[0] if squeeze else s


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


_GRAD_FLOOR = 1e-2


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _weighted_term(v, w):
    """``max(v, 0) ** w`` with a bounded derivative, for use as a training
    loss term.

    The exact relu-clamped power has ``d/dv = w * v**(w-1) -> inf`` as
    ``v -> 0+`` (and NaN at exactly 0), and early-training contrast terms
    routinely touch 0. One such spike permanently inflates Adam's
    second-moment estimates and freezes the run (observed:
    ms2020-msssim-q5 stuck at 16.45 dB, round 3). The primal is EXACTLY
    ``max(v, 0) ** w`` (eval values bit-identical); the derivative is
    evaluated at ``max(v, _GRAD_FLOOR)`` instead, bounding it by
    ``w * _GRAD_FLOOR**(w-1)`` (~3.6 at the smallest standard weight).
    """
    return jnp.maximum(v, 0.0) ** w


@_weighted_term.defjvp
def _weighted_term_jvp(w, primals, tangents):
    (v,), (dv,) = primals, tangents
    vf = jnp.maximum(v, _GRAD_FLOOR)
    return jnp.maximum(v, 0.0) ** w, (w * vf ** (w - 1.0)) * dv


def _as_batch(x):
    x = jnp.asarray(x, jnp.float32)
    return x[None] if x.ndim == 3 else x


def _avg_pool2(x):
    # Count-normalized: at odd dims the edge window averages its real
    # pixels only (zero-padding with a fixed /4 would halve edge values and
    # diverge from the reference metric).
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )
    ones = jnp.ones_like(x)
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )
    return s / n


@functools.partial(jax.jit, static_argnames=("max_val",))
def msssim(a, b, max_val: float = 255.0):
    """Multi-scale SSIM (Wang et al. 2003), matching the standard 5-level
    weights used by the reference's eval (`tf.image.ssim_multiscale`).

    Requires spatial dims >= 11 * 2^4 = 176 (the 11-tap window must fit at
    the coarsest of the 5 scales) — same constraint as the reference metric.
    """
    min_hw = 11 * 2 ** (len(_MSSSIM_WEIGHTS) - 1)
    if min(a.shape[-3], a.shape[-2]) < min_hw:
        raise ValueError(
            f"msssim needs spatial dims >= {min_hw}, got "
            f"{a.shape[-3]}x{a.shape[-2]}"
        )
    squeeze = jnp.ndim(a) == 3
    a, b = _as_batch(a), _as_batch(b)
    values = []
    last = len(_MSSSIM_WEIGHTS) - 1
    for i, w in enumerate(_MSSSIM_WEIGHTS):
        s, cs = _ssim_per_scale(a, b, max_val)
        v = s if i == last else cs
        values.append(_weighted_term(v, w))
        if i < last:
            a = _avg_pool2(a)
            b = _avg_pool2(b)
    out = jnp.prod(jnp.stack(values, 0), axis=0)
    return out[0] if squeeze else out
