"""Diagnose the round-4c HiFiC regression: 192px runs never learn (mse
flat at dataset variance ~5400 -> 10.4 dB eval) while the 128px round-4b
runs reached 25 dB. Two things changed at once: patch size 128 -> 192 and
the interior-latent hinge (commit 0362545). This runs short trains over
the 2x2 combo {128,192}px x {interior hinge on/off} and prints the mse
trajectory for each, isolating the culprit.

Usage: python tools/diag_hific_192.py [--steps 400]
"""

from __future__ import annotations

import argparse
import dataclasses

from compression_tpu.util.cache import enable_compilation_cache

enable_compilation_cache()  # hific 192px compiles are minutes over the tunnel

from compression_tpu.models import common  # noqa: E402
from compression_tpu.models import hific  # noqa: E402


def run(patch: int, ring: int, steps: int, k_gan: float | None = None,
        warmup: int = 0) -> None:
    cfg = hific.get_config("hific-lo")
    # ring large enough that no training patch has an interior -> the
    # hinge falls back to whole-patch bpp (pre-0362545 behavior).
    cfg = dataclasses.replace(cfg, hinge_boundary_ring=ring)
    if k_gan is not None:
        # k_gan=0 isolates the GAN term: if 192px learns with the GAN off,
        # the freeze is discriminator domination, not the transforms.
        cfg = dataclasses.replace(cfg, k_gan=k_gan)
    if warmup:
        # Generator warm-up (3d1cc57): GAN term + D updates gated off for
        # the first `warmup` steps — tests whether a reconstruction-first
        # start escapes the large-patch discriminator-domination freeze.
        cfg = dataclasses.replace(cfg, gan_warmup_steps=warmup)
    tc = common.TrainConfig(
        train_glob="/tmp/tpc_data/train/*.png",
        steps=steps,
        batch_size=8,
        patch_size=patch,
        log_every=100,
        seed=0,
    )
    print(
        f"=== patch={patch} ring={ring} steps={steps}"
        f" k_gan={k_gan} warmup={warmup} ===",
        flush=True,
    )
    hific.train(cfg, tc)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument(
        "--combos", default="128:3,192:99,192:3,128:99",
        help="comma-separated patch:ring[:k_gan[:warmup]] combos"
        " (k_gan 'd' = config default)",
    )
    args = ap.parse_args()
    for combo in args.combos.split(","):
        parts = combo.split(":")
        patch, ring = int(parts[0]), int(parts[1])
        k_gan = None
        if len(parts) > 2 and parts[2] != "d":
            k_gan = float(parts[2])
        warmup = int(parts[3]) if len(parts) > 3 else 0
        run(patch, ring, args.steps, k_gan, warmup)


if __name__ == "__main__":
    main()
