"""NN layers: signal convolutions, GDN, parameterizations, initializers."""

from compression_tpu.layers.gdn import GDN
from compression_tpu.layers.initializers import identity_kernel_init
from compression_tpu.layers.parameters import (
    GDNParameter,
    Parameter,
    RDFTParameter,
    nonneg_apply,
    nonneg_init,
    rdft_apply,
    rdft_basis,
    rdft_init,
)
# NOTE: the functional core lives at compression_tpu.layers.signal_conv
# .signal_conv; it is deliberately NOT re-exported here so the submodule
# name stays importable (no attribute shadowing).
from compression_tpu.layers.signal_conv import (
    SignalConv1D,
    SignalConv2D,
    SignalConv3D,
)
from compression_tpu.layers.soft_round import (
    Round,
    SoftRound,
    SoftRoundConditionalMean,
)

__all__ = [
    "GDN",
    "GDNParameter",
    "Parameter",
    "RDFTParameter",
    "identity_kernel_init",
    "nonneg_apply",
    "nonneg_init",
    "rdft_apply",
    "rdft_basis",
    "rdft_init",
    "SignalConv1D",
    "SignalConv2D",
    "SignalConv3D",
    "Round",
    "SoftRound",
    "SoftRoundConditionalMean",
]
