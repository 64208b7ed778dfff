"""HiFiC: high-fidelity generative image compression (Mentzer et al. 2020).

Reference parity (models/hific/): archs (Encoder/Generator/Discriminator,
ChannelNorm, spectral norm), model (R-D-P + GAN loss, rate targeting),
configs (hific-lo/mi/hi), train, lpips.
"""

from compression_tpu.models.hific.archs import (
    ChannelNorm,
    Discriminator,
    Encoder,
    Generator,
)
from compression_tpu.models.hific.configs import CONFIGS, HificConfig, get_config
from compression_tpu.models.hific.model import (
    HificModel,
    compress,
    decompress,
    make_codec,
    make_loss_fns,
    make_train_steps,
)
from compression_tpu.models.hific.train import train

__all__ = [
    "ChannelNorm",
    "Discriminator",
    "Encoder",
    "Generator",
    "CONFIGS",
    "HificConfig",
    "get_config",
    "HificModel",
    "compress",
    "decompress",
    "make_codec",
    "make_loss_fns",
    "make_train_steps",
    "train",
]
