"""HiFiC architectures: Encoder, Generator, Discriminator.

TPU-native re-implementation of the reference networks (reference:
models/hific/archs.py:1-500; Mentzer, Toderici, Tschannen, Agustsson 2020,
"High-Fidelity Generative Image Compression"):

* Encoder: strided conv stack -> latent y (default 220 channels).
* Generator (the synthesis/decoder): ChannelNorm-conditioned residual
  blocks at the bottleneck resolution, then transposed-conv upsampling.
* Discriminator: conditional on the (upsampled) latent, spectral-normalized
  convs, outputs per-patch logits.

All channels-last, all expressed with SignalConv2D so the conv semantics
(up/downsampling + padding) match the codec layers.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from compression_tpu.layers import SignalConv2D

__all__ = ["ChannelNorm", "Encoder", "Generator", "Discriminator"]


class ChannelNorm(nn.Module):
    """Normalizes over the channel axis per spatial position (reference:
    archs.py ChannelNorm — HiFiC uses it in place of Batch/InstanceNorm so
    generation is resolution- and batch-independent)."""

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones_init(), (c,))
        beta = self.param("beta", nn.initializers.zeros_init(), (c,))
        return (x - mu) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta


class ResidualBlock(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x):
        h = SignalConv2D(
            self.filters, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv0",
        )(x)
        h = ChannelNorm(name="norm0")(h)
        h = nn.relu(h)
        h = SignalConv2D(
            self.filters, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv1",
        )(h)
        h = ChannelNorm(name="norm1")(h)
        return x + h


class Encoder(nn.Module):
    """Image -> latent y. Widths (60, 120, 240, 480, 960) -> num_latents."""

    num_latents: int = 220

    @nn.compact
    def __call__(self, x):
        x = SignalConv2D(
            60, (7, 7), corr=True, padding="same_zeros", use_bias=True,
            name="conv0",
        )(x)
        x = ChannelNorm(name="norm0")(x)
        x = nn.relu(x)
        for i, f in enumerate((120, 240, 480, 960)):
            x = SignalConv2D(
                f, (3, 3), corr=True, strides_down=2, padding="same_zeros",
                use_bias=True, name=f"conv{i+1}",
            )(x)
            x = ChannelNorm(name=f"norm{i+1}")(x)
            x = nn.relu(x)
        return SignalConv2D(
            self.num_latents, (3, 3), corr=True, padding="same_zeros",
            use_bias=True, name="conv_out",
        )(x)


class Generator(nn.Module):
    """Latent y_hat -> image. Residual trunk + 4x transposed-conv upsampling."""

    num_residual_blocks: int = 9

    @nn.compact
    def __call__(self, y):
        x = ChannelNorm(name="norm_in")(y)
        x = SignalConv2D(
            960, (3, 3), corr=True, padding="same_zeros", use_bias=True,
            name="conv_in",
        )(x)
        x = ChannelNorm(name="norm_head")(x)
        for i in range(self.num_residual_blocks):
            x = ResidualBlock(960, name=f"res{i}")(x)
        for i, f in enumerate((480, 240, 120, 60)):
            x = SignalConv2D(
                f, (3, 3), corr=False, strides_up=2, padding="same_zeros",
                use_bias=True, name=f"up{i}",
            )(x)
            x = ChannelNorm(name=f"upnorm{i}")(x)
            x = nn.relu(x)
        return SignalConv2D(
            3, (7, 7), corr=True, padding="same_zeros", use_bias=True,
            name="conv_out",
        )(x)


class Discriminator(nn.Module):
    """Conditional patch discriminator with spectral normalization.

    Conditioned on the latent (projected and nearest-upsampled 16x to the
    image grid, reference archs.py Discriminator).
    """

    @nn.compact
    def __call__(self, x, y_latent, update_stats: bool = True):
        c = SignalConv2D(
            12, (3, 3), corr=True, padding="same_zeros", use_bias=True,
            name="latent_proj",
        )(y_latent)
        c = nn.relu(c)
        # Nearest-neighbor 16x upsample to the image resolution.
        for _ in range(4):
            b, h, w, ch = c.shape
            c = jnp.broadcast_to(
                c[:, :, None, :, None, :], (b, h, 2, w, 2, ch)
            ).reshape(b, h * 2, w * 2, ch)
        c = c[:, : x.shape[1], : x.shape[2], :]
        h = jnp.concatenate([x, c], axis=-1)

        for i, (f, stride) in enumerate(
            ((64, 2), (128, 2), (256, 2), (512, 1))
        ):
            conv = nn.SpectralNorm(
                nn.Conv(f, (4, 4), strides=(stride, stride), padding="SAME",
                        name=f"conv{i}"),
            )
            h = conv(h, update_stats=update_stats)
            h = nn.leaky_relu(h, 0.2)
        logits = nn.SpectralNorm(
            nn.Conv(1, (1, 1), padding="SAME", name="conv_out"),
        )(h, update_stats=update_stats)
        return logits
