"""Pallas TPU kernel: fused GDN (square -> channel matmul -> rsqrt -> mul).

The GDN normalization ``y = x * rsqrt(beta + x^2 @ gamma)`` is the
elementwise-heavy half of every transform layer. XLA already fuses most of
it into the conv epilogue; this kernel is the hand-fused alternative for
the standalone-GDN case: one VMEM-resident pass per row tile — the x tile
is read once, squared on the VPU, hits the MXU for the channel mix, and is
rescaled in place, instead of materializing x^2 and the norm field in HBM.

Used by :class:`compression_tpu.layers.GDN` when ``use_pallas=True`` (or
env ``TPC_PALLAS_GDN=1``); numerics are tested against the lax path in
tests/test_pallas_gdn.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_gdn"]

_ROW_BLOCK = 512


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    gamma = gamma_ref[:]
    beta = beta_ref[:]
    norm = (
        jnp.dot(x * x, gamma, preferred_element_type=jnp.float32)
        + beta[None, :]
    )
    scale = jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm)
    out_ref[:] = (x * scale).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def fused_gdn(x, beta, gamma, inverse: bool = False, interpret: bool = False):
    """Fused GDN over the trailing channel axis.

    Args:
      x: (..., C) activations.
      beta: (C,), gamma: (C, C) — *effective* (already reparameterized)
        parameters.
      inverse: IGDN (multiply by the norm) instead of divide.
      interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
      Same shape/dtype as ``x``.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)
    # Pad rows up to the block size (channels are handled by the compiler).
    padded_rows = -(-rows // _ROW_BLOCK) * _ROW_BLOCK
    if padded_rows != rows:
        x2 = jnp.pad(x2, ((0, padded_rows - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((padded_rows, c), x.dtype),
        grid=(padded_rows // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, c), lambda i: (i, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, gamma.astype(jnp.float32), beta.astype(jnp.float32))

    return out[:rows].reshape(orig_shape)
