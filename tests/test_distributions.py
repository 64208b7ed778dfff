import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from compression_tpu import distributions as d


class TestNormal:
    def test_log_prob_matches_scipy(self):
        dist = d.Normal(jnp.array(0.3), jnp.array(1.7))
        x = np.linspace(-5, 5, 41)
        np.testing.assert_allclose(
            dist.log_prob(jnp.asarray(x)),
            scipy.stats.norm.logpdf(x, 0.3, 1.7),
            rtol=1e-6,
        )

    def test_cdf_sf(self):
        dist = d.Normal(jnp.array(0.0), jnp.array(2.0))
        x = np.linspace(-8, 8, 17)
        np.testing.assert_allclose(
            dist.cdf(jnp.asarray(x)), scipy.stats.norm.cdf(x, 0, 2), rtol=1e-6
        )
        np.testing.assert_allclose(
            dist.log_survival_function(jnp.asarray(x)),
            scipy.stats.norm.logsf(x, 0, 2),
            rtol=1e-5,
        )

    def test_tails(self):
        dist = d.Normal(jnp.array(1.0), jnp.array(3.0))
        tm = 2**-8
        lo = d.lower_tail(dist, tm)
        hi = d.upper_tail(dist, tm)
        np.testing.assert_allclose(lo, scipy.stats.norm.ppf(tm / 2, 1, 3), rtol=1e-5)
        np.testing.assert_allclose(hi, scipy.stats.norm.isf(tm / 2, 1, 3), rtol=1e-5)

    def test_quantization_offset_mod_one(self):
        dist = d.Normal(jnp.array([0.2, 1.8, -2.3]), jnp.array(1.0))
        off = d.quantization_offset(dist)
        np.testing.assert_allclose(off, [0.2, -0.2, -0.3], atol=1e-6)


class TestLogistic:
    def test_log_prob_matches_scipy(self):
        dist = d.Logistic(jnp.array(-0.5), jnp.array(0.8))
        x = np.linspace(-6, 6, 25)
        np.testing.assert_allclose(
            dist.log_prob(jnp.asarray(x)),
            scipy.stats.logistic.logpdf(x, -0.5, 0.8),
            rtol=1e-6,
        )

    def test_tails_analytic(self):
        dist = d.Logistic(jnp.array(0.0), jnp.array(1.0))
        tm = 0.01
        np.testing.assert_allclose(
            d.lower_tail(dist, tm), scipy.stats.logistic.ppf(tm / 2), rtol=1e-6
        )


class TestEstimateTails:
    def test_normal_quantile_by_bisection(self):
        dist = d.Normal(jnp.zeros((4,)), jnp.ones((4,)))
        target = np.log(2**-9)
        x = d.estimate_tails(dist.log_cdf, target, (4,), jnp.float64)
        np.testing.assert_allclose(x, scipy.stats.norm.ppf(2**-9), rtol=1e-6)

    def test_decreasing_function(self):
        dist = d.Normal(jnp.zeros(()), jnp.ones(()))
        target = np.log(1e-3)
        x = d.estimate_tails(dist.log_survival_function, target, (), jnp.float64)
        np.testing.assert_allclose(x, scipy.stats.norm.isf(1e-3), rtol=1e-6)


class TestUniformNoise:
    def test_density_is_cdf_difference(self):
        base = d.Normal(jnp.array(0.0), jnp.array(0.7))
        noisy = d.UniformNoiseAdapter(base)
        y = np.linspace(-4, 4, 33)
        expected = scipy.stats.norm.cdf(y + 0.5, 0, 0.7) - scipy.stats.norm.cdf(
            y - 0.5, 0, 0.7
        )
        np.testing.assert_allclose(noisy.prob(jnp.asarray(y)), expected, rtol=1e-5)

    def test_integrates_to_one(self):
        noisy = d.NoisyNormal(0.0, 0.25)
        y = jnp.linspace(-8, 8, 16001)
        total = jnp.trapezoid(noisy.prob(y), y)
        np.testing.assert_allclose(total, 1.0, rtol=1e-4)

    def test_stable_in_far_tails(self):
        noisy = d.NoisyNormal(0.0, 1.0)
        lp = noisy.log_prob(jnp.array([-40.0, 40.0]))
        assert np.all(np.isfinite(np.asarray(lp)))
        g = jax.grad(lambda v: jnp.sum(noisy.log_prob(v)))(jnp.array([-40.0, 40.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_mixture_noisy(self):
        noisy = d.NoisyNormalMixture(
            logits=jnp.array([0.0, 1.0]),
            loc=jnp.array([-2.0, 2.0]),
            scale=jnp.array([0.5, 1.0]),
        )
        y = jnp.linspace(-10, 10, 8001)
        total = jnp.trapezoid(noisy.prob(y), y)
        np.testing.assert_allclose(total, 1.0, rtol=1e-4)
        assert noisy.batch_shape == ()


class TestDeepFactorized:
    def _dist(self, shape=(2,)):
        return d.DeepFactorized.create(
            jax.random.PRNGKey(0), shape, dtype=jnp.float64
        )

    def test_cdf_monotone_and_bounded(self):
        dist = self._dist((3,))
        # At init the overall CDF slope is ~1/init_scale (=0.1), so the tails
        # only vanish a few init_scales out — probe at +-300.
        x = jnp.linspace(-300, 300, 601)[:, None]
        c = np.asarray(dist.cdf(x))
        assert np.all((c >= 0) & (c <= 1))
        assert np.all(np.diff(c, axis=0) >= -1e-9)
        assert np.all(c[0] < 1e-3) and np.all(c[-1] > 1 - 1e-3)

    def test_log_prob_integrates_to_one(self):
        dist = self._dist((1,))
        x = jnp.linspace(-400, 400, 64001)[:, None]
        total = jnp.trapezoid(jnp.exp(dist.log_prob(x))[:, 0], x[:, 0])
        np.testing.assert_allclose(total, 1.0, rtol=1e-3)

    def test_noisy_integrates_to_one(self):
        noisy = d.UniformNoiseAdapter(self._dist((1,)))
        y = jnp.linspace(-400, 400, 64001)[:, None]
        total = jnp.trapezoid(noisy.prob(y)[:, 0], y[:, 0])
        np.testing.assert_allclose(total, 1.0, rtol=1e-3)

    def test_tails_bracket_mass(self):
        dist = self._dist((4,))
        tm = 2**-8
        lo = d.lower_tail(dist, tm)
        hi = d.upper_tail(dist, tm)
        assert lo.shape == (4,) and hi.shape == (4,)
        np.testing.assert_array_less(np.asarray(lo), np.asarray(hi))
        np.testing.assert_allclose(dist.cdf(lo), tm / 2, rtol=1e-4)
        np.testing.assert_allclose(dist.survival_function(hi), tm / 2, rtol=1e-4)

    def test_offset_is_median(self):
        dist = self._dist((4,))
        med = dist._quantization_offset()
        np.testing.assert_allclose(dist.cdf(med), 0.5, atol=1e-6)

    def test_pytree_roundtrip(self):
        dist = self._dist((2,))
        leaves, treedef = jax.tree_util.tree_flatten(dist)
        dist2 = jax.tree_util.tree_unflatten(treedef, leaves)
        x = jnp.array([0.3, -0.7])
        np.testing.assert_allclose(dist.log_prob(x), dist2.log_prob(x))

    def test_works_under_jit(self):
        dist = self._dist((2,))
        f = jax.jit(lambda dd, x: dd.log_prob(x))
        out = f(dist, jnp.array([0.1, 0.2]))
        np.testing.assert_allclose(out, dist.log_prob(jnp.array([0.1, 0.2])))


class TestRoundAdapters:
    def test_round_adapter_pmf(self):
        base = d.Normal(jnp.array(0.2), jnp.array(1.0))
        noisy = d.NoisyRoundAdapter(base)
        # At integer y, prob(y) = P(round(X) = y).
        for n in [-2, -1, 0, 1, 2]:
            expected = scipy.stats.norm.cdf(n + 0.5, 0.2) - scipy.stats.norm.cdf(
                n - 0.5, 0.2
            )
            np.testing.assert_allclose(
                noisy.prob(jnp.array(float(n))), expected, rtol=1e-5
            )

    @pytest.mark.parametrize("alpha", [1.0, 5.0])
    def test_soft_round_adapter_integrates(self, alpha):
        noisy = d.NoisySoftRoundedNormal(0.0, 1.0, alpha=alpha)
        y = jnp.linspace(-10, 10, 8001)
        total = jnp.trapezoid(noisy.prob(y), y)
        np.testing.assert_allclose(total, 1.0, rtol=1e-3)

    def test_soft_round_high_alpha_near_hard(self):
        soft = d.NoisySoftRoundedNormal(0.0, 1.0, alpha=500.0)
        hard = d.NoisyRoundedNormal(0.0, 1.0)
        np.testing.assert_allclose(
            soft.prob(jnp.array(0.0)), hard.prob(jnp.array(0.0)), rtol=1e-2
        )
