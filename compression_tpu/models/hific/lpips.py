"""LPIPS perceptual distance (VGG16 features, learned linear weights).

The reference downloads a frozen LPIPS TF graph (reference:
models/hific/helpers.py `ensure_lpips_weights`); with zero egress this
module implements the VGG16-LPIPS architecture directly in flax and loads
converted weights from a local file when available
(``TPC_LPIPS_WEIGHTS`` or ``<model_dir>/lpips_vgg16.msgpack``, produced by
``tools/convert_lpips.py`` from a torchvision/torch LPIPS checkpoint).
Without weights it falls back to randomly initialized features — still a
valid perceptual-ish metric for smoke training (random VGG features are a
known-decent perceptual basis), but evaluation parity requires the
converted weights; the fallback is logged loudly.
"""

from __future__ import annotations

import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "lpips_params_path"]

# VGG16 conv widths per block (features tapped after the last conv of each).
_BLOCKS: Tuple[Tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)

# ImageNet normalization (inputs in [0, 1]).
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def lpips_params_path() -> str | None:
    path = os.environ.get("TPC_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        return path
    from compression_tpu.cli.registry import model_dir

    fallback = os.path.join(model_dir(), "lpips_vgg16.msgpack")
    return fallback if os.path.exists(fallback) else None


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        for b, widths in enumerate(_BLOCKS):
            for c, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding="SAME", name=f"conv{b}_{c}")(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips(a, b): inputs (N, H, W, 3) in [0, 1]; returns (N,) distances."""

    @nn.compact
    def __call__(self, a, b):
        vgg = _VGG16Features(name="vgg")
        mean = jnp.asarray(_MEAN)
        std = jnp.asarray(_STD)
        fa = vgg((a - mean) / std)
        fb = vgg((b - mean) / std)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # Unit-normalize channels, then a learned per-channel weight.
            na = xa * jax.lax.rsqrt(
                jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10
            )
            nb = xb * jax.lax.rsqrt(
                jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10
            )
            w = self.param(
                f"lin{i}",
                nn.initializers.constant(1.0 / xa.shape[-1]),
                (xa.shape[-1],),
            )
            diff = jnp.square(na - nb) * jnp.maximum(w, 0.0)
            total = total + jnp.mean(jnp.sum(diff, axis=-1), axis=(1, 2))
        return total


def make_lpips(example_hw: int = 64):
    """Returns (module, params); loads converted weights when present."""
    model = LPIPS()
    x = jnp.zeros((1, example_hw, example_hw, 3))
    params = model.init(jax.random.PRNGKey(7), x, x)
    path = lpips_params_path()
    if path is not None:
        from flax import serialization

        with open(path, "rb") as f:
            params = serialization.from_bytes(params, f.read())
    else:
        import sys

        print(
            "[compression_tpu.hific] WARNING: no converted LPIPS weights "
            "found; using randomly initialized VGG features (smoke mode). "
            "Run tools/convert_lpips.py for evaluation parity.",
            file=sys.stderr,
        )
    return model, params
