"""Diagnose bmshj2018 hyper-synthesis sigma-pathway health (VERDICT r4
weak #2 / task 2): is the hyperprior's scale field carrying information,
or is most of y coded at the scale-table floor?

Measures, for a trained checkpoint on the eval images:
  - sigma dynamic range + histogram, fraction within 1% of SCALES_MIN
  - rate split y vs z (a healthy hyperprior spends a few % on z and
    earns it back many times over on y)
  - the oracle comparison: actual y bits under predicted sigma vs y bits
    under the single best GLOBAL sigma (what a factorized/one-scale coder
    could do at best). If predicted-sigma rate is not clearly below the
    global-scale rate, the sigma pathway is not earning its side channel.

Usage: python tools/diag_bmshj_sigma.py [ckpt] [--model NAME]
  default ckpt: ckpt/bmshj2018.msgpack (the bench checkpoint)
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default="ckpt/bmshj2018.msgpack")
    ap.add_argument("--glob", default="/tmp/tpc_data/eval/*.png")
    args = ap.parse_args()

    from compression_tpu.entropy_models import SCALES_MIN
    from compression_tpu.models import bmshj2018, common
    from compression_tpu.util import image as image_util

    model = bmshj2018.BMSHJ2018Model(bmshj2018.Config())
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    params, step = common.load_checkpoint(args.ckpt, params)
    print(f"checkpoint {args.ckpt} (step {step})")

    paths = sorted(glob.glob(args.glob))
    if not paths:
        raise SystemExit(f"no eval images match {args.glob}")

    @jax.jit
    def probe(p, x):
        y, z = model.apply(
            p, x, method=bmshj2018.BMSHJ2018Model.encode_latents
        )
        z_hat = jnp.round(z)
        sigma = model.apply(
            p, z_hat, method=bmshj2018.BMSHJ2018Model.sigma_from_zhat
        )
        return y, z, sigma

    def bits_gaussian(y, sigma):
        # Discrete-Gaussian bits of round(y) under N(0, sigma): the same
        # quantity the coder realizes (up to table quantization).
        from jax.scipy.stats import norm

        q = jnp.round(y)
        upper = norm.cdf((q + 0.5) / sigma)
        lower = norm.cdf((q - 0.5) / sigma)
        p = jnp.clip(upper - lower, 2.0 ** -20, 1.0)
        return -jnp.sum(jnp.log2(p))

    bits_fn = jax.jit(bits_gaussian)

    for path in paths:
        img = image_util.read_png(path)
        x = jnp.asarray(img, jnp.float32)[None] / 255.0
        x, _ = image_util.pad_to_multiple(x, 64)
        y, z, sigma = probe(params, x)
        y, z, sigma = map(np.asarray, jax.device_get((y, z, sigma)))
        npx = x.shape[1] * x.shape[2]
        floor_frac = float(np.mean(sigma <= SCALES_MIN * 1.01))
        pred_bits = float(bits_fn(jnp.asarray(y), jnp.asarray(sigma)))
        # Global-sigma oracle: best single scale for this image.
        best = min(
            float(bits_fn(jnp.asarray(y), jnp.float32(s)))
            for s in np.geomspace(SCALES_MIN, 64.0, 25)
        )
        zq = np.round(z)
        print(
            f"{os.path.basename(path):12s} "
            f"sigma[min/med/max]={sigma.min():.3f}/"
            f"{np.median(sigma):.3f}/{sigma.max():.2f} "
            f"floor%={100 * floor_frac:.1f} "
            f"y@pred={pred_bits / npx:.4f}bpp "
            f"y@best-global={best / npx:.4f}bpp "
            f"gain={(best - pred_bits) / npx:+.4f}bpp "
            f"|z|rms={np.sqrt(np.mean(zq ** 2)):.2f}"
        )


if __name__ == "__main__":
    main()
