"""CPU probe for the 192px HiFiC learning freeze (tools/diag_hific_192.py).

Compares, at identical random init, the gradient of the PURE MSE term
w.r.t. the generator parameters at patch 128 vs 192. If the 192px mse
gradient is structurally blocked (norm collapse / NaN), the freeze is a
forward/backward bug; if the norms are comparable, the freeze is an
optimization-dynamics problem (discriminator domination at the larger
patch).

Usage: JAX_PLATFORMS=cpu python tools/diag_hific_gradprobe.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.models.hific.configs import get_config
from compression_tpu.models.hific.model import HificModel


def probe(patch: int) -> None:
    cfg = get_config("hific-lo")
    model = HificModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, patch, patch, 3)), jnp.float32
    )
    params = model.init(rng, x, jax.random.PRNGKey(1), training=True)

    def mse_loss(p):
        x_hat, _, _, _ = model.apply(p, x, jax.random.PRNGKey(2), training=True)
        return jnp.mean(jnp.square(x - x_hat)) * 255.0**2

    mse, g = jax.value_and_grad(mse_loss)(params)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    total = sum(float(jnp.sum(jnp.square(v))) for _, v in leaves) ** 0.5
    nans = sum(int(jnp.sum(~jnp.isfinite(v))) for _, v in leaves)
    # Per-module grad norms for the synthesis side (generator)
    gen = {
        jax.tree_util.keystr(k): float(jnp.linalg.norm(v))
        for k, v in leaves
        if "generator" in jax.tree_util.keystr(k).lower()
    }
    gen_total = sum(v**2 for v in gen.values()) ** 0.5
    print(
        f"patch={patch}: mse={float(mse):9.1f} grad_norm={total:9.3f} "
        f"generator_grad_norm={gen_total:9.3f} nonfinite={nans}"
    )
    zeros = [k for k, v in gen.items() if v == 0.0]
    if zeros:
        print(f"  zero-grad generator leaves: {zeros[:8]}")


if __name__ == "__main__":
    for p in (128, 192):
        probe(p)
