"""Forward cross-check for the 192px HiFiC freeze: is the generator's
OUTPUT disconnected from its inputs/params at 12x12 latent grids on the
TPU backend?

Evidence motivating this (tools/diag_hific_192.py with k_gan=0): at
192px the training trajectories are bit-identical regardless of k_gan,
mse stays at dataset variance while tracking the batch, and d_loss
collapses — all consistent with x_hat being a constant (independent of
generator params and latents) in the compiled 192px training program,
while 128px (8x8 latents) and full-res eval (48x32) are fine. Round 3
already found one shape-specific miscompile on this backend
(lhs-dilated convs, routed around by phase decomposition).

Checks, on the default (TPU) backend vs the cpu backend:
  1. generator forward at 8x8 / 12x12 / 16x16 latent grids: TPU vs CPU
     output max-rel deviation;
  2. sensitivity: perturb the latent and one param leaf — does the TPU
     output move?

Run: JAX_PLATFORMS=axon,cpu python tools/diag_gen_forward.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.models.hific.archs import Generator


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-12))


def check(grid: int) -> None:
    gen = Generator(num_residual_blocks=9)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, grid, grid, 220)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), y)

    fwd = jax.jit(gen.apply)
    x_dev = np.asarray(fwd(params, y))
    with jax.default_device(jax.devices("cpu")[0]):
        x_cpu = np.asarray(jax.jit(gen.apply)(params, y))

    # Sensitivity on the device: nudge the latent; a healthy generator
    # moves, a disconnected one does not.
    x_dev2 = np.asarray(fwd(params, y + 0.1))
    moved = float(np.abs(x_dev2 - x_dev).max())
    print(
        f"latent grid {grid}x{grid}: TPU-vs-CPU rel err {rel(x_dev, x_cpu):.2e}; "
        f"TPU output moved {moved:.3e} for a 0.1 latent nudge; "
        f"TPU output std {x_dev.std():.3e} (CPU {x_cpu.std():.3e})"
    )


if __name__ == "__main__":
    for g in (8, 12, 16):
        check(g)
