import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu.ops import (
    round_st,
    soft_round,
    soft_round_conditional_mean,
    soft_round_inverse,
)


class TestRoundST:
    def test_forward_is_round(self):
        x = jnp.array([-1.6, -0.4, 0.4, 1.5, 2.5])
        np.testing.assert_allclose(round_st(x), jnp.round(x))

    def test_gradient_is_identity(self):
        x = jnp.array([-1.6, 0.4, 2.5])
        g = jax.grad(lambda v: jnp.sum(round_st(v)))(x)
        np.testing.assert_allclose(g, jnp.ones_like(x))

    def test_offset(self):
        x = jnp.array([0.7, 1.2, -0.3])
        off = jnp.array([0.25, 0.25, 0.25])
        out = round_st(x, offset=off)
        np.testing.assert_allclose(out, jnp.round(x - off) + off)
        g = jax.grad(lambda v: jnp.sum(round_st(v, offset=off)))(x)
        np.testing.assert_allclose(g, jnp.ones_like(x))


class TestSoftRound:
    def test_low_alpha_is_identity(self):
        x = jnp.linspace(-2, 2, 50)
        np.testing.assert_allclose(soft_round(x, 1e-6), x, atol=1e-6)

    def test_high_alpha_approaches_round(self):
        x = jnp.array([-1.4, -0.6, 0.3, 1.7, 2.2])
        np.testing.assert_allclose(soft_round(x, 1e4), jnp.round(x), atol=1e-3)

    def test_integers_plus_half_are_fixed(self):
        # m = n + 0.5 are fixed points; integers map to integers.
        for alpha in [0.5, 1.0, 5.0, 12.0]:
            x = jnp.array([-2.0, -0.5, 0.0, 0.5, 1.0, 2.5])
            y = soft_round(x, alpha)
            np.testing.assert_allclose(y, x, atol=1e-5)

    @pytest.mark.parametrize("alpha", [0.3, 1.0, 4.0, 10.0])
    def test_inverse_roundtrip(self, alpha):
        x = jnp.linspace(-3.2, 3.2, 201)
        y = soft_round(x, alpha)
        x2 = soft_round_inverse(y, alpha)
        np.testing.assert_allclose(x2, x, atol=1e-4)

    def test_monotonic(self):
        x = jnp.linspace(-2, 2, 400)
        y = soft_round(x, 6.0)
        assert np.all(np.diff(np.asarray(y)) >= -1e-7)

    def test_differentiable(self):
        g = jax.grad(lambda v: jnp.sum(soft_round(v, 5.0)))(jnp.array([0.3, 1.2]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.all(np.asarray(g) > 0)

    def test_conditional_mean_bounds(self):
        # Conditional mean pulls reconstructions toward bin centers.
        y = jnp.array([0.9, 1.1, -0.4])
        r = soft_round_conditional_mean(y, 4.0)
        assert np.all(np.abs(np.asarray(r) - np.round(np.asarray(y))) <= 0.5 + 1e-6)
