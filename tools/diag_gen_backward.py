"""TPU-vs-CPU GENERATOR-backward cross-check for the 192px HiFiC freeze.

New evidence (round-4 tail, tools/diag_hific_192.py with k_gan=0 and with
gan_warmup=400): at 192px the mse stays frozen at dataset variance even
with the GAN term fully off and the discriminator frozen — trajectories
are byte-identical across GAN configs — while bpp falls normally. So the
freeze is NOT GAN dynamics: rate learning (encoder/EM side) proceeds and
reconstruction learning (generator side) is dead at 192px only.

Prior probes covered the ENCODER backward (diag_grad_miscompile.py:
healthy at both sizes) and the GENERATOR forward (diag_gen_forward.py:
healthy at 8/12/16 grids). The one unchecked edge is the generator
BACKWARD at the 12x12 latent grid: its upsampling convs' VJPs are exactly
the lhs-dilated-conv family the round-3 forward miscompile lived in.

Run: python tools/diag_gen_backward.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.util.cache import enable_compilation_cache

enable_compilation_cache()

from compression_tpu.models.hific.archs import Generator  # noqa: E402


def check(grid: int) -> None:
    gen = Generator(num_residual_blocks=9)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, grid, grid, 220)), jnp.float32)
    t = jnp.asarray(
        rng.random((2, grid * 16, grid * 16, 3)), jnp.float32
    )
    params = gen.init(jax.random.PRNGKey(0), y)

    def loss(p):
        return jnp.mean(jnp.square(gen.apply(p, y) - t))

    g_dev = jax.device_get(jax.jit(jax.grad(loss))(params))
    with jax.default_device(jax.devices("cpu")[0]):
        g_cpu = jax.device_get(jax.jit(jax.grad(loss))(params))

    def flat(g):
        return np.concatenate(
            [np.asarray(v, np.float64).ravel()
             for v in jax.tree_util.tree_leaves(g)]
        )

    a, b = flat(g_dev), flat(g_cpu)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    ratio = float(np.linalg.norm(a) / (np.linalg.norm(b) + 1e-30))

    leaves_cpu = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_cpu)
    }

    def rel(x, y_):
        x = np.asarray(x, np.float64)
        y_ = np.asarray(y_, np.float64)
        return float(np.abs(x - y_).max() / max(np.abs(y_).max(), 1e-12))

    worst = sorted(
        ((rel(v, leaves_cpu[jax.tree_util.keystr(k)]),
          jax.tree_util.keystr(k))
         for k, v in jax.tree_util.tree_leaves_with_path(g_dev)),
        reverse=True,
    )
    print(
        f"grid {grid:2d}x{grid:2d}: cosine(TPU,CPU)={cos:.6f} "
        f"|TPU|/|CPU|={ratio:.4f}; worst leaves:"
    )
    for e, k in worst[:4]:
        print(f"    {e:.2e}  {k}")


def main() -> None:
    for grid in (8, 12, 16):
        check(grid)


if __name__ == "__main__":
    main()
