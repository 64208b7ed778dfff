"""Focused probe of the 8x8-latent-grid generator forward on the TPU
backend: tools/diag_gen_forward.py measured max|f(y+0.1)-f(y)| == 0.0
EXACTLY at 8x8 while 12x12/16x16 move ~2.8e-2 — either a shape-specific
miscompile (cf. the round-3 lhs-dilated-conv finding) or a probe
artifact. Disambiguate:

  1. nudge magnitudes 0.1 / 1.0 / 10.0, jitted and unjitted;
  2. perturb a PARAM leaf instead of the latent;
  3. fresh random y2 (not y+eps) — does the output change at all?
  4. batch 1 vs 2.

Run: python tools/diag_gen_8x8.py   (PYTHONPATH must keep .axon_site)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.models.hific.archs import Generator


def main() -> None:
    gen = Generator(num_residual_blocks=9)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 8, 8, 220)), jnp.float32)
    y2 = jnp.asarray(rng.normal(size=(2, 8, 8, 220)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), y)

    fwd = jax.jit(gen.apply)
    base = np.asarray(fwd(params, y))

    for eps in (0.1, 1.0, 10.0):
        d_jit = float(np.abs(np.asarray(fwd(params, y + eps)) - base).max())
        d_raw = float(
            np.abs(np.asarray(gen.apply(params, y + eps)) - base).max()
        )
        print(f"nudge {eps:5.1f}: jit moved {d_jit:.3e}  unjit moved {d_raw:.3e}")

    d_fresh = float(np.abs(np.asarray(fwd(params, y2)) - base).max())
    print(f"fresh y2   : jit moved {d_fresh:.3e}")

    leaf_path = jax.tree_util.tree_leaves_with_path(params)[0]
    pert = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    d_param = float(np.abs(np.asarray(fwd(pert, y)) - base).max())
    print(f"params+0.01: jit moved {d_param:.3e}  (first leaf {jax.tree_util.keystr(leaf_path[0])})")

    y1 = y[:1]
    fwd1 = jax.jit(gen.apply)
    b1 = np.asarray(fwd1(params, y1))
    d_b1 = float(np.abs(np.asarray(fwd1(params, y1 + 0.1)) - b1).max())
    print(f"batch1 nudge 0.1: jit moved {d_b1:.3e}")


if __name__ == "__main__":
    main()
