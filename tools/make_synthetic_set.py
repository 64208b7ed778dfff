"""Deterministic synthetic train/eval image set generator.

Produces the dataset behind the results/synthetic/ R-D tables
(seed-stable): N training images at 256x256 (default 160 — round 1 used
24, which the mean-conditioned models memorize: mu predicts training
latents near-exactly, then mispredicts on held-out images and the
escape-coded residuals explode the rate ~8x) and 4 held-out eval images
at 768x512 (seeds 100..103, unchanged across rounds for comparability),
with structured content (oriented gratings, gradients, rectangles, mild
sensor noise) so the statistics are natural-ish and compressible. Plays
the role of the reference's Kodak/CLIC eval data (reference:
results/image_compression/) in a sandbox that ships no image datasets.

Usage: python tools/make_synthetic_set.py [outdir] [num_train]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def make(h: int, w: int, seed: int) -> np.ndarray:
    r = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fx, fy = r.uniform(5, 40, 2)
    img = np.stack(
        [
            (np.sin(xx / fx + r.uniform(0, 6)) * 0.5 + 0.5) * 255,
            (yy / h * 255 + r.uniform(-50, 50)) % 255,
            (np.cos(yy / fy) * np.sin(xx / (fx * 0.7)) * 0.5 + 0.5) * 255,
        ],
        -1,
    )
    # random rectangles (edges) + smooth blobs
    for _ in range(6):
        y0, x0 = r.randint(0, h - 20), r.randint(0, w - 20)
        hh, ww = r.randint(10, h // 3), r.randint(10, w // 3)
        img[y0 : y0 + hh, x0 : x0 + ww] = r.randint(0, 255, 3)
    img += r.randn(h, w, 3) * 3
    return np.clip(img, 0, 255).astype(np.uint8)


def main(outdir: str = "/tmp/tpc_data", num_train: str = "160") -> None:
    from compression_tpu.util import image as image_util

    n = int(num_train)
    os.makedirs(os.path.join(outdir, "train"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "eval"), exist_ok=True)
    for i in range(n):
        # Train seeds 0..95 then 112+: the eval block (100..103) and a
        # guard margin are never used for training.
        seed = i if i < 96 else i + 16
        image_util.write_png(
            os.path.join(outdir, "train", f"{i:03d}.png"), make(256, 256, seed)
        )
    for i in range(4):
        image_util.write_png(
            os.path.join(outdir, "eval", f"{i}.png"), make(512, 768, 100 + i)
        )
    # Rate-probe images for HiFiC's probe-calibrated hinge: the SAME
    # generator at eval resolution, but seeds far outside both the train
    # range (0..n+16) and the eval block (100..103) — train-distribution
    # content, zero test leakage (HificConfig.rate_probe_glob).
    os.makedirs(os.path.join(outdir, "probe"), exist_ok=True)
    for i in range(2):
        image_util.write_png(
            os.path.join(outdir, "probe", f"{i}.png"), make(512, 768, 9000 + i)
        )
    print(
        f"dataset written to {outdir} "
        f"({n} train @256, 4 eval @768x512, 2 probe @768x512)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
