"""Spatially sharded convolutions with halo exchange.

For images too large for one chip's HBM, the input is sharded along H over
a mesh axis and convolved locally; the rows a kernel needs from the
neighboring shard (the *halo*) are exchanged with `ppermute` over ICI
before the local conv. This is the image-domain analog of
ring-attention/context parallelism (SURVEY.md §5: build (b)) — the
reference has no equivalent (it runs whole images through TF convs and is
simply memory-bound).

Restrictions (deliberate, covers the codec workloads): "same_zeros"
padding, channels-last, sharding along the H axis only, shard height
>= halo width and divisible by the H stride. Downsampling strides are
supported (the analysis transforms are the memory-pressure direction:
they ingest the full-resolution image); transposed upsampling is not —
decode-side memory peaks at the small latent, where sharding buys nothing.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from compression_tpu.layers.signal_conv import signal_conv
from compression_tpu.ops.padding_ops import same_padding_for_kernel

__all__ = ["sharded_signal_conv2d"]


def sharded_signal_conv2d(x, kernel, mesh: Mesh, axis: str = "data",
                          corr: bool = True,
                          strides_down: Union[int, Sequence[int]] = 1):
    """`signal_conv(..., padding="same_zeros", strides_down=s)` with H
    sharded over `axis`.

    Window alignment: "same" padding totals kh-1 regardless of stride, so
    shard i's first output window starts at global row ``i*H_loc - pad_lo``
    — exactly the halo-extended local row 0 — and advances by the stride;
    with ``H_loc % s == 0`` every shard produces ``H_loc/s`` rows and the
    concatenation equals the dense result.

    Args:
      x: (N, H, W, C) with H divisible by (mesh axis size * H stride).
      kernel: (kh, kw, C, Cout).
      strides_down: int or (sh, sw) downsampling stride.

    Returns:
      (N, H/sh, W/sw ("same" semantics), Cout), sharded the same way.
    """
    sh, sw = ((strides_down,) * 2 if isinstance(strides_down, int)
              else tuple(strides_down))
    (pad_lo, pad_hi), _ = same_padding_for_kernel(kernel.shape[:2], corr)
    n_shards = mesh.shape[axis]
    if (x.shape[1] // n_shards) % sh:
        raise ValueError(
            f"shard height {x.shape[1]}/{n_shards} must be divisible by the "
            f"H stride {sh}"
        )

    def local(x_local, kernel):
        idx = jax.lax.axis_index(axis)
        # Halo exchange: receive pad_lo rows from the upper neighbor and
        # pad_hi rows from the lower neighbor (zeros at the boundaries).
        up = jax.lax.ppermute(
            x_local[:, -pad_lo:, :, :] if pad_lo else x_local[:, :0],
            axis,
            [(i, (i + 1) % n_shards) for i in range(n_shards)],
        )
        down = jax.lax.ppermute(
            x_local[:, :pad_hi, :, :] if pad_hi else x_local[:, :0],
            axis,
            [(i, (i - 1) % n_shards) for i in range(n_shards)],
        )
        # Zero out wrapped halos at the global boundaries (same_zeros).
        up = jnp.where(idx == 0, jnp.zeros_like(up), up)
        down = jnp.where(idx == n_shards - 1, jnp.zeros_like(down), down)
        padded = jnp.concatenate([up, x_local, down], axis=1)
        # W is unsharded: pad it locally; H padding came from the halos.
        y = signal_conv(
            jnp.pad(padded, ((0, 0), (0, 0), same_padding_for_kernel(kernel.shape[1:2], corr)[0], (0, 0))),
            kernel,
            corr=corr,
            padding="valid",
            strides_down=(sh, sw),
        )
        return y

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return mapped(x, kernel)
