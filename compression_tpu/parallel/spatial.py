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
>= halo width and divisible by the H stride. Both directions are
covered: downsampling strides (analysis — ingests the full-resolution
image) via :func:`sharded_signal_conv2d`, and transposed upsampling
(synthesis — produces it) via :func:`sharded_signal_conv2d_up`, which
rides the same phase decomposition as the dense path
(layers/signal_conv.py): the upsampled conv becomes a dense stride-1
halo conv producing phase-major channels plus a purely LOCAL
depth-to-space, so the only communication is the same ppermute halo
exchange.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from compression_tpu.layers.signal_conv import phase_kernel, signal_conv
from compression_tpu.ops.padding_ops import same_padding_for_kernel

__all__ = ["sharded_signal_conv2d", "sharded_signal_conv2d_up"]


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


def sharded_signal_conv2d_up(x, kernel, mesh: Mesh, axis: str = "data",
                             corr: bool = False,
                             strides_up: Union[int, Sequence[int]] = 2):
    """``signal_conv(..., padding="same_zeros", strides_up=s,
    extra_pad_end=True)`` with H sharded over ``axis`` — the synthesis
    (decode-side) counterpart of :func:`sharded_signal_conv2d`.

    Via the phase decomposition, output rows ``su*q + p`` depend on input
    rows ``q + mlo .. q + mlo + M - 1`` only, so shard i's ``H_loc`` input
    rows plus a ``(-mlo, M-1+mlo)`` halo produce exactly its
    ``su * H_loc`` output rows; depth-to-space is local.

    Args:
      x: (N, H, W, C) with H divisible by the mesh axis size.
      kernel: (kh, kw, C, Cout); ``corr=False`` = convolution orientation
        (the SignalConv synthesis default).

    Returns:
      (N, H*su, W*su, Cout), sharded along H the same way.
    """
    ndim = 2
    su = ((strides_up,) * 2 if isinstance(strides_up, int)
          else tuple(strides_up))
    support = kernel.shape[:2]
    # Padding anchor follows the ORIGINAL orientation (signal_conv
    # computes `same` padding from `corr` and then flips the kernel).
    pad = same_padding_for_kernel(support, corr)
    if not corr:
        kernel = jnp.flip(kernel, axis=(0, 1))
    lo = [p[0] for p in pad]
    hi = [p[1] + s - 1 for p, s in zip(pad, su)]  # extra_pad_end
    n = x.shape[1:3]
    T = [
        (n[d] - 1) * su[d] + 1 + lo[d] + hi[d] - support[d] + 1
        for d in range(ndim)
    ]
    if any(T[d] != n[d] * su[d] for d in range(ndim)):
        raise ValueError(
            f"same_zeros upsampling should produce n*su outputs; got {T} "
            f"for input {n} — unsupported kernel/stride combination"
        )
    pk, mlo, M = phase_kernel(kernel, su, lo)
    # Output row block q (one per input row) reads input rows
    # q+mlo .. q+mlo+M-1: halo = (-mlo) rows from above, (M-1+mlo) below.
    h_lo, h_hi = -mlo[0], M[0] - 1 + mlo[0]
    w_pad = (-mlo[1], n[1] - 1 + mlo[1] + M[1] - n[1])
    n_shards = mesh.shape[axis]
    if x.shape[1] % n_shards:
        raise ValueError(
            f"H ({x.shape[1]}) must divide the mesh axis ({n_shards})"
        )
    if x.shape[1] // n_shards < max(h_lo, h_hi):
        raise ValueError(
            f"shard height {x.shape[1] // n_shards} smaller than the halo "
            f"({h_lo}, {h_hi})"
        )
    cout = kernel.shape[-1]

    def local(x_local, pk):
        idx = jax.lax.axis_index(axis)
        up = jax.lax.ppermute(
            x_local[:, -h_lo:, :, :] if h_lo else x_local[:, :0],
            axis,
            [(i, (i + 1) % n_shards) for i in range(n_shards)],
        )
        down = jax.lax.ppermute(
            x_local[:, :h_hi, :, :] if h_hi else x_local[:, :0],
            axis,
            [(i, (i - 1) % n_shards) for i in range(n_shards)],
        )
        up = jnp.where(idx == 0, jnp.zeros_like(up), up)
        down = jnp.where(idx == n_shards - 1, jnp.zeros_like(down), down)
        padded = jnp.concatenate([up, x_local, down], axis=1)
        padded = jnp.pad(padded, ((0, 0), (0, 0), w_pad, (0, 0)))
        y = signal_conv(padded, pk, corr=True, padding="valid")
        # Local depth-to-space: (N, Hl, W, su0, su1, cout) interleave.
        q = y.shape[1:3]
        y = y.reshape(y.shape[:3] + tuple(su) + (cout,))
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        return y.reshape(
            (y.shape[0], q[0] * su[0], q[1] * su[1], cout)
        )

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return mapped(x, pk)


def sharded_transform_apply(params, x, mesh: Mesh, axis: str, layers):
    """Runs a SignalConv stack H-sharded over the mesh from its param tree.

    The codec transforms (analysis/synthesis/hyper/slice nets across every
    model family) are all the same shape of program — a chain of
    SignalConvs with optional bias, GDN/IGDN, or ReLU after each — so the
    per-family ``sharded_*`` entry points reduce to a declarative layer
    list over this one driver.

    Args:
      params: the transform's param subtree (e.g.
        ``params["params"]["analysis"]``), holding ``conv<i>`` (and GDN
        subtree) entries.
      layers: sequence of dicts, one per conv, with keys:
        ``name``: conv param name;
        ``down``/``up``: stride (int; ``down=1`` = stride-1 halo conv,
          at most one of the two);
        ``post``: None | "relu" | "gdn" | "igdn" (GDN variants read their
          params from ``params[spec["gdn"]]``).

    Returns the output array, sharded along H like the input.
    """
    from compression_tpu.layers import GDN

    for spec in layers:
        conv = params[spec["name"]]
        if spec.get("up"):
            x = sharded_signal_conv2d_up(
                x, conv["kernel"], mesh, axis, corr=False,
                strides_up=spec["up"],
            )
        else:
            x = sharded_signal_conv2d(
                x, conv["kernel"], mesh, axis, corr=True,
                strides_down=spec.get("down", 1),
            )
        if "bias" in conv:
            x = x + conv["bias"]
        post = spec.get("post")
        if post == "relu":
            x = jax.nn.relu(x)
        elif post in ("gdn", "igdn"):
            x = GDN(inverse=post == "igdn").apply(
                {"params": params[spec["gdn"]]}, x
            )
    return x


__all__.append("sharded_transform_apply")
