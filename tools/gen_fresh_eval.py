"""Write a fresh-seed eval set for generalization checks.

Generates 768x512 images from the same synthetic generator as
tools/make_synthetic_set.py but with seeds far outside every block any
training or eval set has ever used (train: 0..95, 112..655 at n=640;
frozen eval: 100..103). Evaluating a trained model on these measures
generalization to unseen draws of the same source — the memorization
signature (tools/make_synthetic_set.py docstring) would show up as a
large seen-vs-fresh bpp/PSNR gap.

Usage: python tools/gen_fresh_eval.py [outdir] [base_seed]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from make_synthetic_set import make  # noqa: E402  (same directory)


def main(outdir: str = "/tmp/tpc_gen", base_seed: str = "10000") -> None:
    from compression_tpu.util import image as image_util

    base = int(base_seed)
    os.makedirs(outdir, exist_ok=True)
    for i in range(4):
        image_util.write_png(
            os.path.join(outdir, f"fresh{i}.png"), make(512, 768, base + i)
        )
    print(f"wrote 4 fresh-seed (seeds {base}..{base + 3}) eval images to {outdir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
