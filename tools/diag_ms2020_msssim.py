"""Root-cause the ms2020 -msssim training failure (round 4).

Two 25k-step retrains (r3, r4) both left training-set MS-SSIM stuck at
~0.43 while mbt2018 with the IDENTICAL loss wiring reaches 0.97 within a
few hundred steps. Hypotheses to separate:
  (a) zero/garbage distortion gradient at init (clip saturation or the
      slice-chain STE killing the msssim path) -> compare grad norms of
      the distortion term at init for ms2020 vs mbt2018;
  (b) the trained model's x_hat is range-shifted on training crops ->
      load the trained checkpoint, report x_hat mean/min/max + msssim
      before/after clip;
  (c) the metric itself disagrees with eval -> run the eval-style metric
      on the same crops.

Run: JAX_PLATFORMS=cpu python tools/diag_ms2020_msssim.py
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.models import common, mbt2018, ms2020
from compression_tpu.util import image as image_util


def load_batch(patch=256, n=4, seed=0):
    rng = np.random.default_rng(seed)
    files = sorted(glob.glob("/tmp/tpc_data/train/*.png"))
    out = []
    for i in range(n):
        img = image_util.read_png(files[rng.integers(len(files))])
        h0 = rng.integers(img.shape[0] - patch + 1)
        w0 = rng.integers(img.shape[1] - patch + 1)
        out.append(img[h0 : h0 + patch, w0 : w0 + patch])
    return jnp.asarray(np.stack(out), jnp.float32) / 255.0


def grad_report(name, model, make_loss, params, batch):
    def dist_only(p):
        x_hat, *_ = model.apply(p, batch, jax.random.PRNGKey(1), training=True)
        d, _, sim = common.distortion_loss(batch, x_hat, "msssim")
        return d, (x_hat, sim)

    (d, (x_hat, sim)), g = jax.value_and_grad(dist_only, has_aux=True)(params)
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g))
        )
    )
    finite = all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
    print(
        f"{name:24s} 1-msssim={float(d):.4f} msssim={float(sim):.4f} "
        f"|grad|={gnorm:.4e} finite={finite} "
        f"x_hat[mean={float(x_hat.mean()):+.3f} min={float(x_hat.min()):+.3f} "
        f"max={float(x_hat.max()):+.3f} frac_in01="
        f"{float(jnp.mean((x_hat >= 0) & (x_hat <= 1))):.3f}]"
    )


def main():
    batch = load_batch()
    key = jax.random.PRNGKey(0)

    # (a) init-time gradient comparison
    ms_model = ms2020.MS2020Model(ms2020.Config(distortion="msssim"))
    ms_params = ms_model.init(key, batch, jax.random.PRNGKey(0), training=True)
    grad_report("ms2020 @init", ms_model, None, ms_params, batch)

    mbt_model = mbt2018.MBT2018Model(mbt2018.Config(distortion="msssim"))
    mbt_params = mbt_model.init(key, batch, jax.random.PRNGKey(0), training=True)
    grad_report("mbt2018 @init", mbt_model, None, mbt_params, batch)

    # (b)/(c) trained checkpoint behavior on train crops
    try:
        from compression_tpu.cli.tfci import _load_model

        _, model, params = _load_model("ms2020-cc10-msssim-5")
        grad_report("ms2020 @trained", model, None, params, batch)
        x_hat, *_ = model.apply(
            params, batch, jax.random.PRNGKey(1), training=False
        )
        sim_eval = image_util.msssim(
            batch, jnp.clip(x_hat, 0, 1), max_val=1.0
        )
        mse = jnp.mean(jnp.square(batch - jnp.clip(x_hat, 0, 1)))
        print(
            f"trained eval-mode on train crops: msssim={float(jnp.mean(sim_eval)):.4f} "
            f"psnr={-10 * np.log10(float(mse)):.2f}"
        )
    except Exception as e:  # checkpoint may be mid-write on the queue box
        print("trained-checkpoint probe skipped:", e)


if __name__ == "__main__":
    main()
