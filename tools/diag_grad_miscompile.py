"""TPU-vs-CPU gradient cross-check for the 192px HiFiC freeze.

Round-3 found the TPU backend miscompiles lhs-dilated (upsampling)
convolutions in the FORWARD direction (routed around by phase
decomposition in SignalConv). The VJP of a strides_down conv is itself an
lhs-dilated conv — so the same platform bug family can corrupt the
BACKWARD pass of the encoder's strided convs at shapes the forward fix
never touches. tools/diag_hific_192.py showed hific learns at 128px but
is frozen at 192px; this checks whether encoder gradients at the two
patch sizes match a CPU reference.

Run on the TPU host: python tools/diag_grad_miscompile.py
(compares jax.grad on the default backend vs the cpu backend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.models.hific.archs import Encoder


def check(patch: int) -> None:
    enc = Encoder()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, patch, patch, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        y = enc.apply(p, xx)
        return jnp.mean(jnp.square(y))

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    gp_dev, gx_dev = jax.device_get(grad_fn(params, x))
    with jax.default_device(jax.devices("cpu")[0]):
        gp_cpu, gx_cpu = jax.device_get(jax.jit(jax.grad(loss, (0, 1)))(params, x))

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.maximum(np.abs(b).max(), 1e-12)
        return float(np.abs(a - b).max() / denom)

    leaves_dev = jax.tree_util.tree_leaves_with_path(gp_dev)
    leaves_cpu = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gp_cpu)
    )
    worst = sorted(
        ((rel(v, leaves_cpu[jax.tree_util.keystr(k)]), jax.tree_util.keystr(k))
         for k, v in leaves_dev),
        reverse=True,
    )
    print(f"patch={patch}: d(input) rel err {rel(gx_dev, gx_cpu):.2e}; "
          f"worst param grads:")
    for e, k in worst[:5]:
        print(f"  {e:.2e}  {k}")


if __name__ == "__main__":
    for p in (128, 192):
        check(p)
