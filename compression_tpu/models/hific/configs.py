"""HiFiC named configurations (reference: models/hific/configs.py:30-80).

Three operating points — hific-lo / -mi / -hi — distinguished only by the
target rate and the rate-hinge lambdas. Loss weights follow the paper
(Mentzer et al. 2020, Table 4): MSE (on 0-255 scale) * 0.075 * 2^-5,
LPIPS weight 1.0, GAN weight 0.15.
"""

from __future__ import annotations

import dataclasses

__all__ = ["HificConfig", "get_config", "CONFIGS"]


@dataclasses.dataclass(frozen=True)
class HificConfig:
    name: str
    target_rate: float            # bpp target for the rate hinge
    lambda_a: float = 0.1         # rate weight when bpp > target (push down)
    lambda_b: float = 2.0 ** -4   # rate weight when bpp <= target (relax)
    k_mse: float = 0.075 * 2.0 ** -5
    k_lpips: float = 1.0
    k_gan: float = 0.15
    num_latents: int = 220
    num_hyperlatents: int = 320
    num_residual_blocks: int = 9
    lr: float = 1e-4
    disc_lr: float = 1e-4


CONFIGS = {
    "hific-lo": HificConfig(name="hific-lo", target_rate=0.14),
    "hific-mi": HificConfig(name="hific-mi", target_rate=0.30),
    "hific-hi": HificConfig(name="hific-hi", target_rate=0.45),
}


def get_config(name: str) -> HificConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown HiFiC config {name!r}; have {sorted(CONFIGS)}")
    return CONFIGS[name]
