"""Diagnose the HiFiC train-vs-eval rate inversion (round 4).

Observed: hific-lo trains to 0.218 bpp (noise proxy, 128px patches) but
evals at 0.556 bpp coded on 768x512 — while hific-hi trains at 0.424 and
evals at 0.504. Decomposes eval bpp into: noise-proxy bpp, discrete
(round) theoretical bpp, coded y bytes, coded z bytes, packing overhead —
on the full eval image AND a 128px crop, so content/scale gaps separate
from coding gaps.

Run (CPU, so the chip queue is undisturbed):
  JAX_PLATFORMS=cpu python tools/diag_hific_rate.py hific-lo hific-hi
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.cli.tfci import _load_model
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util


def probe(name: str, image: np.ndarray, tag: str):
    entry, model, params = _load_model(name)
    x = jnp.asarray(image, jnp.float32)[None] / 255.0
    x, (h, w) = image_util.pad_to_multiple(x, 64)
    npx = image.shape[0] * image.shape[1]

    rng = jax.random.PRNGKey(0)
    _, _, bpp_noise, _ = model.apply(params, x, rng, training=True)
    _, _, bpp_round, _ = model.apply(params, x, rng, training=False)
    # padded-pixel normalization inside the model: rescale to true pixels
    pad_px = x.shape[1] * x.shape[2]
    bpp_noise = float(bpp_noise) * pad_px / npx
    bpp_round = float(bpp_round) * pad_px / npx

    from compression_tpu.models import hific as _h

    codec = _h.model.make_codec(model, params)
    blob = codec.compress(image)
    packed = PackedTensors(blob)
    y_s, z_s, _, _ = packed.unpack([object, object, np.int32, np.int32])
    y_bytes = len(bytes(y_s[0]))
    z_bytes = len(bytes(z_s[0]))
    total = len(blob)
    print(
        f"{name:10s} {tag:12s} noise={bpp_noise:.4f} round={bpp_round:.4f} "
        f"coded={total * 8 / npx:.4f} (y={y_bytes * 8 / npx:.4f} "
        f"z={z_bytes * 8 / npx:.4f} pack={(total - y_bytes - z_bytes) * 8 / npx:.4f})"
    )


def main():
    names = sys.argv[1:] or ["hific-lo", "hific-hi"]
    img = image_util.read_png("/tmp/tpc_data/eval/0.png")
    hc, wc = img.shape[0] // 2, img.shape[1] // 2
    crop = img[hc - 64 : hc + 64, wc - 64 : wc + 64]
    for name in names:
        probe(name, img, "full-768x512")
        probe(name, crop, "crop-128")


if __name__ == "__main__":
    main()
