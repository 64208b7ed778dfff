import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu.ops import lower_bound, perturb_and_apply, upper_bound


def _grad_at(fn, x):
    return jax.grad(lambda v: jnp.sum(fn(v)))(x)


class TestBounds:
    def test_forward_values(self):
        x = jnp.array([-1.0, 0.0, 1.0, 2.0])
        np.testing.assert_allclose(lower_bound(x, 0.5), [0.5, 0.5, 1.0, 2.0])
        np.testing.assert_allclose(upper_bound(x, 0.5), [-1.0, 0.0, 0.5, 0.5])

    @pytest.mark.parametrize("gradient", ["disconnected", "identity", "identity_if_towards"])
    def test_lower_bound_gradients(self, gradient):
        x = jnp.array([-1.0, 2.0])
        bound = 0.0
        # Upstream cotangent +1 (pushes x down, away from feasible set for
        # clipped entries) and -1 (pushes x up, toward feasible set).
        for cot, expected in [
            (+1.0, {"disconnected": [0.0, 1.0], "identity": [1.0, 1.0],
                    "identity_if_towards": [0.0, 1.0]}),
            (-1.0, {"disconnected": [0.0, -1.0], "identity": [-1.0, -1.0],
                    "identity_if_towards": [-1.0, -1.0]}),
        ]:
            g = jax.grad(lambda v: cot * jnp.sum(lower_bound(v, bound, gradient)))(x)
            np.testing.assert_allclose(g, expected[gradient], err_msg=f"cot={cot}")

    @pytest.mark.parametrize("gradient", ["disconnected", "identity", "identity_if_towards"])
    def test_upper_bound_gradients(self, gradient):
        x = jnp.array([-2.0, 1.0])
        bound = 0.0
        for cot, expected in [
            (+1.0, {"disconnected": [1.0, 0.0], "identity": [1.0, 1.0],
                    "identity_if_towards": [1.0, 1.0]}),
            (-1.0, {"disconnected": [-1.0, 0.0], "identity": [-1.0, -1.0],
                    "identity_if_towards": [-1.0, 0.0]}),
        ]:
            g = jax.grad(lambda v: cot * jnp.sum(upper_bound(v, bound, gradient)))(x)
            np.testing.assert_allclose(g, expected[gradient], err_msg=f"cot={cot}")

    def test_invalid_gradient_raises(self):
        with pytest.raises(ValueError):
            lower_bound(jnp.zeros(3), 0.0, "nope")

    def test_jit_and_vmap(self):
        x = jnp.linspace(-2, 2, 8).reshape(2, 4)
        out = jax.jit(lambda v: lower_bound(v, 0.0))(x)
        np.testing.assert_allclose(out, np.maximum(np.asarray(x), 0.0))
        out = jax.vmap(lambda v: upper_bound(v, 1.0))(x)
        np.testing.assert_allclose(out, np.minimum(np.asarray(x), 1.0))


class TestPerturbAndApply:
    def test_forward_matches_direct(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (32,))
        u = jax.random.uniform(jax.random.PRNGKey(1), (32,), minval=-0.5, maxval=0.5)
        f = lambda v: jnp.sin(v) * 3.0
        np.testing.assert_allclose(perturb_and_apply(f, x, u), f(x + u), rtol=1e-6)

    def test_expected_gradient(self):
        # d/dx E[f(x+u)] = f(x+.5) - f(x-.5) for elementwise f.
        f = jnp.sin
        x = jnp.array([0.3, -1.2, 2.0])
        u = jnp.array([0.1, -0.4, 0.25])
        g = jax.grad(lambda v: jnp.sum(perturb_and_apply(f, v, u)))(x)
        expected = jnp.sin(x + 0.5) - jnp.sin(x - 0.5)
        np.testing.assert_allclose(g, expected, rtol=1e-6)

    def test_gradient_wrt_args_flows(self):
        f = lambda v, w: v * w
        x = jnp.array([1.0, 2.0])
        u = jnp.array([0.25, -0.25])
        w = jnp.array([3.0, 4.0])
        gw = jax.grad(lambda ww: jnp.sum(perturb_and_apply(f, x, u, ww)))(w)
        # df/dw = x + u (stop-gradiented through x's path).
        np.testing.assert_allclose(gw, x + u, rtol=1e-6)

    def test_monte_carlo_consistency(self):
        # Average gradient over many dithers equals gradient of the smoothed
        # function — here trivially since the custom grad is deterministic.
        f = lambda v: v**2
        x = jnp.full((4,), 0.7)
        u = jax.random.uniform(jax.random.PRNGKey(2), (4,), minval=-0.5, maxval=0.5)
        g = jax.grad(lambda v: jnp.sum(perturb_and_apply(f, v, u)))(x)
        expected = (x + 0.5) ** 2 - (x - 0.5) ** 2  # = 2x
        np.testing.assert_allclose(g, expected, rtol=1e-6)
