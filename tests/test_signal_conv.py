"""SignalConv acceptance tests: exhaustive grid vs a NumPy golden model.

Mirrors the role of the reference's signal_conv_test.py (reference:
tensorflow_compression/python/layers/signal_conv_test.py — the de-facto spec
for the layer): the golden model implements the documented 4-step semantic
(upsample -> pad -> correlate/convolve -> downsample) naively in NumPy, and
the JAX implementation must match it for every parameter combination.
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from compression_tpu.layers import signal_conv as sc
from compression_tpu.ops.padding_ops import same_padding_for_kernel


def golden_signal_conv(x, kernel, corr, sd, su, padding, extra_pad_end):
    """Naive N-D reference: x (N, *sp, Cin), kernel (*support, Cin, Cout)."""
    ndim = x.ndim - 2
    support = kernel.shape[:-2]
    n, cin, cout = x.shape[0], kernel.shape[-2], kernel.shape[-1]

    if not corr:
        kernel = np.flip(kernel, axis=tuple(range(ndim)))

    # 1. upsample
    def upsample(a):
        for d, s in enumerate(su):
            if s == 1:
                continue
            axis = 1 + d
            length = a.shape[axis] * s if extra_pad_end else (a.shape[axis] - 1) * s + 1
            shape = list(a.shape)
            shape[axis] = length
            out = np.zeros(shape, a.dtype)
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(0, length, s)
            out[tuple(idx)] = a
            a = out
        return a

    x = upsample(x)

    # 2. pad
    if padding != "valid":
        pad = same_padding_for_kernel(support, corr)
        mode = "constant" if padding == "same_zeros" else "reflect"
        x = np.pad(x, ((0, 0),) + tuple(pad) + ((0, 0),), mode=mode)

    # 3. correlate (valid) — brute force loops
    out_sp = tuple(x.shape[1 + d] - support[d] + 1 for d in range(ndim))
    y = np.zeros((n,) + out_sp + (cout,), np.float64)
    for pos in itertools.product(*[range(s) for s in out_sp]):
        window = x[(slice(None),) + tuple(slice(p, p + k) for p, k in zip(pos, support))]
        # window: (N, *support, Cin)
        y[(slice(None),) + pos] = np.tensordot(
            window.reshape(n, -1, cin), kernel.reshape(-1, cin, cout), axes=([1, 2], [0, 1])
        )

    # 4. downsample
    for d, s in enumerate(sd):
        if s > 1:
            idx = [slice(None)] * y.ndim
            idx[1 + d] = slice(0, None, s)
            y = y[tuple(idx)]
    return y


GRID_1D = list(
    itertools.product(
        [1, 4, 5],            # kernel support
        [True, False],        # corr
        [1, 2, 3],            # strides_down
        [1, 2, 3],            # strides_up
        ["valid", "same_zeros", "same_reflect"],
        [True, False],        # extra_pad_end
    )
)


@pytest.mark.parametrize("k,corr,sd,su,padding,extra_pad_end", GRID_1D)
@pytest.mark.slow
def test_signal_conv_1d_matches_golden(k, corr, sd, su, padding, extra_pad_end):
    if padding == "same_reflect":
        # reflect needs pad width < upsampled length
        n = max(k, 6)
    else:
        n = 7
    rng = np.random.RandomState(hash((k, corr, sd, su)) % 2**31)
    x = rng.randn(2, n, 3)
    kernel = rng.randn(k, 3, 2)
    want = golden_signal_conv(x, kernel, corr, (sd,), (su,), padding, extra_pad_end)
    got = sc.signal_conv(
        jnp.asarray(x),
        jnp.asarray(kernel),
        corr=corr,
        strides_down=sd,
        strides_up=su,
        padding=padding,
        extra_pad_end=extra_pad_end,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-10)


GRID_2D = list(
    itertools.product(
        [(3, 3), (2, 4), (5, 5)],
        [True, False],
        [(1, 1), (2, 2), (2, 1)],
        [(1, 1), (2, 2), (1, 2)],
        ["valid", "same_zeros", "same_reflect"],
    )
)


@pytest.mark.parametrize("k,corr,sd,su,padding", GRID_2D)
@pytest.mark.slow
def test_signal_conv_2d_matches_golden(k, corr, sd, su, padding):
    rng = np.random.RandomState(hash((k, corr, sd, su, padding)) % 2**31)
    x = rng.randn(1, 8, 9, 2)
    kernel = rng.randn(*k, 2, 3)
    want = golden_signal_conv(x, kernel, corr, sd, su, padding, True)
    got = sc.signal_conv(
        jnp.asarray(x),
        jnp.asarray(kernel),
        corr=corr,
        strides_down=sd,
        strides_up=su,
        padding=padding,
        extra_pad_end=True,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_signal_conv_3d_basic():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 5, 6, 7, 2)
    kernel = rng.randn(3, 3, 3, 2, 4)
    want = golden_signal_conv(x, kernel, True, (1, 2, 1), (1, 1, 1), "same_zeros", True)
    got = sc.signal_conv(
        jnp.asarray(x), jnp.asarray(kernel), corr=True,
        strides_down=(1, 2, 1), padding="same_zeros",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_channel_separable_depthwise():
    rng = np.random.RandomState(1)
    cin, mult = 3, 2
    x = rng.randn(2, 10, 10, cin)
    kernel = rng.randn(3, 3, 1, cin * mult)
    got = sc.signal_conv(
        jnp.asarray(x), jnp.asarray(kernel), corr=True,
        padding="same_zeros", channel_separable=True,
    )
    # golden: per-channel correlation; XLA grouped conv layout is
    # kernel[..., 0, g*mult + m] applied to input channel g.
    for g in range(cin):
        want = golden_signal_conv(
            x[..., g : g + 1], kernel[..., :, g * mult : (g + 1) * mult],
            True, (1, 1), (1, 1), "same_zeros", True,
        )
        np.testing.assert_allclose(
            np.asarray(got[..., g * mult : (g + 1) * mult]), want, rtol=1e-9, atol=1e-9
        )


def test_module_forward_and_grad():
    import flax.linen as nn  # noqa: F401

    m = sc.SignalConv2D(
        num_filters=4, kernel_support=(5, 5), corr=True, strides_down=2,
        padding="same_zeros", use_bias=True,
    )
    x = jnp.ones((1, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 4)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert jnp.all(jnp.isfinite(g["params"]["kernel"]))


def test_module_upsampling_shape():
    m = sc.SignalConv2D(
        num_filters=3, kernel_support=(5, 5), corr=False, strides_up=2,
        padding="same_zeros", use_bias=True,
    )
    x = jnp.ones((1, 8, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 16, 16, 3)


def test_rdft_param_roundtrip_and_forward():
    m = sc.SignalConv2D(
        num_filters=2, kernel_support=(3, 3), corr=True,
        padding="same_zeros", kernel_param="rdft",
    )
    x = jnp.ones((1, 8, 8, 2))
    params = m.init(jax.random.PRNGKey(0), x)
    assert "kernel_rdft" in params["params"]
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 2)


def test_identity_initializer_is_identity():
    from compression_tpu.layers.initializers import identity_kernel_init

    m = sc.SignalConv2D(
        num_filters=3, kernel_support=(5, 5), corr=True,
        padding="same_zeros", kernel_init=identity_kernel_init(),
    )
    x = jnp.asarray(np.random.RandomState(2).randn(1, 9, 9, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6, atol=1e-12)


# Regression grid for the large-kernel/large-upsampling geometries of
# bls2017/b2018 (9x9 strides_up=4): the platform's lhs_dilation conv
# lowering silently miscompiles these on TPU (round-3 finding: ~130%
# relative error for 8x8/9x9 kernels at dilation 4, which surfaced as
# bls2017 "evaluating" 11 dB below its true quality). signal_conv now
# routes ALL zero-padded upsampling through the phase decomposition
# (_phase_upsampled_conv); this grid pins its correctness at the exact
# geometries the dilated path got wrong, plus a margin of odd ones.
GRID_BIG_UP = list(
    itertools.product(
        [7, 8, 9],            # kernel support
        [True, False],        # corr
        [1, 2],               # strides_down (sd>1 exercises the post-slice)
        [4, 5],               # strides_up
        ["valid", "same_zeros"],
        [True, False],        # extra_pad_end
    )
)


@pytest.mark.parametrize("k,corr,sd,su,padding,extra_pad_end", GRID_BIG_UP)
@pytest.mark.slow
def test_signal_conv_big_upsampling_matches_golden(
    k, corr, sd, su, padding, extra_pad_end
):
    rng = np.random.RandomState(hash((k, corr, sd, su, 99)) % 2**31)
    x = rng.randn(2, 6, 3)
    kernel = rng.randn(k, 3, 2)
    want = golden_signal_conv(
        x, kernel, corr, (sd,), (su,), padding, extra_pad_end
    )
    got = sc.signal_conv(
        jnp.asarray(x),
        jnp.asarray(kernel),
        corr=corr,
        strides_down=sd,
        strides_up=su,
        padding=padding,
        extra_pad_end=extra_pad_end,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_signal_conv_2d_9x9_up4_matches_golden():
    """The exact bls2017/b2018 synthesis geometry, in 2D."""
    rng = np.random.RandomState(1234)
    x = rng.randn(1, 5, 6, 4)
    kernel = rng.randn(9, 9, 4, 3)
    want = golden_signal_conv(
        x, kernel, False, (1, 1), (4, 4), "same_zeros", True
    )
    got = sc.signal_conv(
        jnp.asarray(x), jnp.asarray(kernel), corr=False,
        strides_up=4, padding="same_zeros",
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-8)
