"""compression_tpu: a TPU-native learned-compression framework.

Public API assembly (role of the reference's flat ``tfc.*`` namespace;
reference: tensorflow_compression/__init__.py:1-90): layers, distributions,
entropy models, ops, and utilities re-exported at the top level.

Layout:
  ops/             bounded-gradient math, rounding, padding
  distributions/   priors + noise/round adapters (pytree dataclasses)
  codec/           native C++ range coder + CDF quantization (+ NumPy spec)
  layers/          SignalConv, GDN, parameterizations (flax)
  entropy_models/  batched / indexed / universal / power-law
  models/          bls2017, bmshj2018, mbt2018, ms2020, hific, toy_sources
  parallel/        DP training, halo convs, coding pipelines
  util/            PackedTensors, image IO, metrics
  cli/             tfci-compatible command line
"""

from compression_tpu.distributions.deep_factorized import DeepFactorized
from compression_tpu.distributions.helpers import (
    estimate_tails,
    lower_tail,
    quantization_offset,
    upper_tail,
)
from compression_tpu.distributions.round_adapters import (
    NoisyRoundAdapter,
    NoisyRoundedDeepFactorized,
    NoisyRoundedNormal,
    NoisySoftRoundAdapter,
    NoisySoftRoundedDeepFactorized,
    NoisySoftRoundedNormal,
    RoundAdapter,
    SoftRoundAdapter,
)
from compression_tpu.distributions.uniform_noise import (
    NoisyDeepFactorized,
    NoisyLogistic,
    NoisyLogisticMixture,
    NoisyMixtureSameFamily,
    NoisyNormal,
    NoisyNormalMixture,
    UniformNoiseAdapter,
)
from compression_tpu.entropy_models import (
    ContinuousBatchedEntropyModel,
    ContinuousIndexedEntropyModel,
    EntropyBottleneck,
    GaussianConditional,
    LocationScaleIndexedEntropyModel,
    PowerLawEntropyModel,
    UniversalBatchedEntropyModel,
    UniversalIndexedEntropyModel,
)
from compression_tpu.codec.host import (
    pmf_to_quantized_cdf,
    run_length_gamma_decode,
    run_length_gamma_encode,
)
from compression_tpu.layers import (
    GDN,
    Round,
    SignalConv1D,
    SignalConv2D,
    SignalConv3D,
    SoftRound,
    SoftRoundConditionalMean,
    identity_kernel_init,
)
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

# Reference-API alias (tfc.IdentityInitializer; reference:
# python/layers/initializers.py ≈1-45). The functional spelling is
# canonical here — flax passes initializer *functions*, not objects.
IdentityInitializer = identity_kernel_init
from compression_tpu.ops.math_ops import (
    lower_bound,
    perturb_and_apply,
    upper_bound,
)
from compression_tpu.ops.padding_ops import same_padding_for_kernel
from compression_tpu.ops.round_ops import (
    round_st,
    soft_round,
    soft_round_conditional_mean,
    soft_round_inverse,
)
from compression_tpu.util import PackedTensors

__version__ = "0.1.0"
