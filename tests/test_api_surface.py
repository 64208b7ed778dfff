"""Top-level public API surface (P18, reference tensorflow_compression/
__init__.py:1-90): every name the reference re-exports as ``tfc.*`` has a
top-level equivalent here, so a migrating user finds the whole surface in
one namespace."""

import numpy as np


# Reference tfc.* names with identical spellings here.
_REFERENCE_NAMES = [
    # layers
    "SignalConv1D", "SignalConv2D", "SignalConv3D", "GDN",
    "IdentityInitializer", "Round", "SoftRound", "SoftRoundConditionalMean",
    "Parameter", "GDNParameter", "RDFTParameter",
    # distributions
    "DeepFactorized", "NoisyDeepFactorized", "NoisyNormal", "NoisyLogistic",
    "NoisyNormalMixture", "NoisyLogisticMixture", "NoisyMixtureSameFamily",
    "UniformNoiseAdapter", "RoundAdapter", "NoisyRoundAdapter",
    "SoftRoundAdapter", "NoisySoftRoundAdapter",
    "NoisyRoundedNormal", "NoisyRoundedDeepFactorized",
    "NoisySoftRoundedNormal", "NoisySoftRoundedDeepFactorized",
    # distribution helpers
    "quantization_offset", "lower_tail", "upper_tail", "estimate_tails",
    # entropy models (2.x canonical + 1.x aliases)
    "ContinuousBatchedEntropyModel", "ContinuousIndexedEntropyModel",
    "LocationScaleIndexedEntropyModel", "UniversalBatchedEntropyModel",
    "UniversalIndexedEntropyModel", "PowerLawEntropyModel",
    "EntropyBottleneck", "GaussianConditional",
    # ops
    "upper_bound", "lower_bound", "perturb_and_apply", "round_st",
    "soft_round", "soft_round_inverse", "soft_round_conditional_mean",
    "same_padding_for_kernel",
    # native codec ops
    "pmf_to_quantized_cdf", "run_length_gamma_encode",
    "run_length_gamma_decode",
    # util
    "PackedTensors",
]

# The canonical JAX core of the Parameter wrappers is functional (flax
# modules take init/apply function pairs); the class spellings above are
# thin pytree wrappers over these.
_FUNCTIONAL_EQUIVALENTS = [
    "nonneg_init", "nonneg_apply",          # GDNParameter
    "rdft_init", "rdft_apply", "rdft_basis",  # RDFTParameter
    "identity_kernel_init",                 # IdentityInitializer (canonical)
]


def test_reference_surface_present():
    import compression_tpu as tpc

    missing = [n for n in _REFERENCE_NAMES + _FUNCTIONAL_EQUIVALENTS
               if not hasattr(tpc, n)]
    assert not missing, missing


def test_parameter_wrappers_roundtrip_and_jit():
    """Class-style Parameter wrappers: effective-value round-trip, the
    nonneg floor, and pytree transparency under jit/grad."""
    import jax
    import jax.numpy as jnp

    import compression_tpu as tpc

    g = tpc.GDNParameter.create(jnp.array([0.5, 0.0, 2.0]), minimum=0.0)
    np.testing.assert_allclose(
        np.asarray(g()), [0.5, 0.0, 2.0], atol=1e-6
    )
    assert isinstance(g, tpc.Parameter)
    # jit sees it as a pytree; gradients flow to the stored leaf.
    val = jax.jit(lambda p: jnp.sum(p()))(g)
    assert np.isfinite(float(val))
    grads = jax.grad(lambda p: jnp.sum(p() ** 2))(g)
    assert grads.stored.shape == g.stored.shape

    kernel = np.random.RandomState(0).randn(3, 3, 2, 4).astype(np.float32)
    r = tpc.RDFTParameter.create(kernel)
    np.testing.assert_allclose(np.asarray(r()), kernel, atol=1e-5)
    assert r.coeffs.shape == (9, 2, 4)


def test_native_ops_callable_from_top_level():
    import compression_tpu as tpc

    cdf = tpc.pmf_to_quantized_cdf(
        np.array([0.5, 0.25, 0.25]), np.array([3], np.int32), 12
    )
    assert cdf[0, -1] == 4096  # 2^precision terminator
    assert (np.diff(cdf[0]) > 0).all()  # every symbol codable

    vals = np.array([0, 0, 7, 0, 0, 0, -3, 1], np.int32)
    blob = tpc.run_length_gamma_encode(vals)
    np.testing.assert_array_equal(
        tpc.run_length_gamma_decode(blob, vals.shape), vals
    )
