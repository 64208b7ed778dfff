"""Entropy model tests: round-trip, rate sanity, grid placement.

Mirrors the reference's load-bearing properties (reference:
continuous_batched_test.py / continuous_indexed_test.py / universal_test.py /
power_law_test.py; SURVEY.md §4):
  (1) decompress(compress(y)) == quantize(y) exactly;
  (2) training-time bits ~= encoded length (within tail-mass slack);
  (3) shape/coding-rank permutations;
  (4) table build sanity.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from compression_tpu.distributions.deep_factorized import DeepFactorized
from compression_tpu.distributions.uniform_noise import (
    NoisyNormal,
    UniformNoiseAdapter,
)
from compression_tpu import entropy_models as em


def _make_prior(channels=4, seed=0):
    base = DeepFactorized.create(
        jax.random.PRNGKey(seed), batch_shape=(channels,)
    )
    return UniformNoiseAdapter(base)


class TestContinuousBatched:
    def test_training_call_shapes_and_grads(self):
        prior = _make_prior(3)
        model = em.ContinuousBatchedEntropyModel(prior, coding_rank=3)
        y = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3) * 2)
        y_tilde, bits = model(y, rng=jax.random.PRNGKey(1), training=True)
        assert y_tilde.shape == y.shape
        assert bits.shape == (2,)
        assert np.all(np.asarray(bits) > 0)

        def loss(yy):
            _, b = model(yy, rng=jax.random.PRNGKey(1), training=True)
            return jnp.sum(b)

        g = jax.grad(loss)(y)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_roundtrip_exact(self):
        prior = _make_prior(3)
        model = em.ContinuousBatchedEntropyModel(
            prior, coding_rank=3, compression=True
        )
        y = jnp.asarray(np.random.RandomState(1).randn(2, 6, 5, 3) * 3)
        strings = model.compress(y)
        assert len(strings) == 2
        y_hat = model.decompress(strings, (6, 5))
        want = np.asarray(model.quantize(y))
        np.testing.assert_allclose(np.asarray(y_hat), want, atol=1e-5)

    def test_rate_estimate_close_to_code_length(self):
        prior = _make_prior(2, seed=3)
        model = em.ContinuousBatchedEntropyModel(
            prior, coding_rank=3, compression=True
        )
        y = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 2) * 2)
        # Rate of the *quantized* values (training=False path).
        _, bits_est = model(y, training=False)
        strings = model.compress(y)
        actual_bits = len(strings[0]) * 8
        est = float(bits_est[0])
        # Range coder overhead: <= few bytes + precision slack.
        assert actual_bits < est * 1.1 + 128, (actual_bits, est)
        assert actual_bits > est * 0.8 - 64, (actual_bits, est)

    def test_extreme_values_roundtrip_via_escape(self):
        prior = _make_prior(2, seed=4)
        model = em.ContinuousBatchedEntropyModel(
            prior, coding_rank=2, compression=True
        )
        y = jnp.asarray([[1000.0, -1000.0], [0.0, 0.5]])[None]
        strings = model.compress(y)
        y_hat = model.decompress(strings, (2,))
        want = np.asarray(model.quantize(y))
        np.testing.assert_allclose(np.asarray(y_hat), want, atol=1e-5)

    def test_offset_heuristic_tables(self):
        prior = _make_prior(3, seed=5)
        m1 = em.ContinuousBatchedEntropyModel(
            prior, coding_rank=1, compression=True, offset_heuristic=True
        )
        assert np.all(np.abs(m1.tables.offset) <= 0.5)

    def test_laplace_tail_mass_gradient_alive_far_out(self):
        prior = _make_prior(1, seed=6)
        model = em.ContinuousBatchedEntropyModel(
            prior, coding_rank=1, laplace_tail_mass=1e-3
        )
        y = jnp.asarray([50.0])

        def loss(yy):
            _, b = model(yy, rng=jax.random.PRNGKey(0), training=True)
            return jnp.sum(b)

        g = np.asarray(jax.grad(loss)(y))
        assert np.all(np.isfinite(g)) and np.any(g != 0)


class TestContinuousIndexed:
    def _model(self, compression=False, coding_rank=1):
        return em.ContinuousIndexedEntropyModel(
            prior_fn=lambda loc, scale: NoisyNormal(loc=loc, scale=scale),
            index_ranges=(10,),
            parameter_fns={
                "loc": lambda i: jnp.zeros_like(i),
                "scale": lambda i: jnp.exp(-1.0 + 0.4 * i),
            },
            coding_rank=coding_rank,
            compression=compression,
        )

    def test_training_call(self):
        model = self._model()
        y = jnp.asarray(np.random.RandomState(0).randn(20))
        idx = jnp.asarray(np.random.RandomState(1).uniform(0, 9, 20))
        y_tilde, bits = model(y, idx, rng=jax.random.PRNGKey(0))
        assert y_tilde.shape == y.shape
        assert bits.shape == ()

        # Gradient flows into the index tensor (the hyper-network path).
        def loss(ii):
            _, b = model(y, ii, rng=jax.random.PRNGKey(0))
            return jnp.sum(b)

        g = np.asarray(jax.grad(loss)(idx))
        assert np.all(np.isfinite(g)) and np.any(g != 0)

    def test_roundtrip(self):
        model = self._model(compression=True, coding_rank=1)
        rng = np.random.RandomState(2)
        y = jnp.asarray(rng.randn(3, 50) * 4)
        idx = jnp.asarray(rng.randint(0, 10, (3, 50)).astype(np.float64))
        strings = model.compress(y, idx)
        assert len(strings) == 3
        y_hat = model.decompress(strings, idx)
        np.testing.assert_allclose(
            np.asarray(y_hat), np.round(np.asarray(y)), atol=1e-6
        )

    def test_rate_sanity(self):
        model = self._model(compression=True, coding_rank=1)
        rng = np.random.RandomState(3)
        scale_idx = np.full(4096, 7.0)
        scale = np.exp(-1.0 + 0.4 * scale_idx)
        y = jnp.asarray(rng.randn(4096) * scale)
        _, bits_est = model(y, jnp.asarray(scale_idx), training=False)
        strings = model.compress(y[None], jnp.asarray(scale_idx)[None])
        actual = len(strings[0]) * 8
        est = float(bits_est)
        assert abs(actual - est) / est < 0.1, (actual, est)


class TestLocationScale:
    def test_roundtrip_with_loc(self):
        model = em.LocationScaleIndexedEntropyModel(
            NoisyNormal, coding_rank=1, compression=True
        )
        rng = np.random.RandomState(4)
        loc = jnp.asarray(rng.randn(2, 40) * 3)
        scale = jnp.asarray(np.exp(rng.uniform(-1.5, 3, (2, 40))))
        y = loc + jnp.asarray(rng.randn(2, 40)) * scale
        strings = model.compress(y, scale, loc=loc)
        y_hat = model.decompress(strings, scale, loc=loc)
        want = np.asarray(model.quantize(y, loc=loc))
        np.testing.assert_allclose(np.asarray(y_hat), want, atol=1e-5)

    def test_training_matches_alias(self):
        assert em.GaussianConditional is em.LocationScaleIndexedEntropyModel
        model = em.LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=2)
        y = jnp.asarray(np.random.RandomState(5).randn(4, 8))
        scale = jnp.ones((4, 8)) * 0.5
        y_tilde, bits = model(y, scale, rng=jax.random.PRNGKey(0))
        assert y_tilde.shape == y.shape and bits.shape == ()

    def test_scale_fn_roundtrip(self):
        i = jnp.arange(em.SCALES_LEVELS, dtype=jnp.float64)
        s = em.log_scale_fn(i)
        back = em.inverse_log_scale_fn(s)
        np.testing.assert_allclose(np.asarray(back), np.asarray(i), atol=1e-9)
        assert float(s[0]) == pytest.approx(em.SCALES_MIN)
        assert float(s[-1]) == pytest.approx(em.SCALES_MAX)


class TestUniversal:
    def test_batched_roundtrip_dithered(self):
        prior = _make_prior(4, seed=7)
        model = em.UniversalBatchedEntropyModel(
            prior, coding_rank=3, compression=True
        )
        y = jnp.asarray(np.random.RandomState(6).randn(2, 5, 5, 4) * 2)
        strings = model.compress(y)
        y_hat = model.decompress(strings, (5, 5))
        # Reconstruction grid is the dithered grid: error <= 1/2 everywhere.
        err = np.abs(np.asarray(y_hat) - np.asarray(y))
        assert err.max() <= 0.5 + 1e-6
        # Offsets differ across channels (that's the point).
        assert len(np.unique(model.tables.offset)) > 1

    def test_eval_path_matches_codec_grid(self):
        """training=False reconstructions == actual compress/decompress."""
        prior = _make_prior(4, seed=12)
        model = em.UniversalBatchedEntropyModel(
            prior, coding_rank=3, compression=True
        )
        y = jnp.asarray(np.random.RandomState(13).randn(1, 4, 4, 4) * 2)
        y_eval, _ = model(y, training=False)
        y_codec = model.decompress(model.compress(y), (4, 4))
        np.testing.assert_allclose(
            np.asarray(y_eval), np.asarray(y_codec), atol=1e-5
        )

        idx_model = em.UniversalIndexedEntropyModel(
            prior_fn=lambda loc, scale: NoisyNormal(loc=loc, scale=scale),
            index_ranges=(6,),
            parameter_fns={
                "loc": lambda i: jnp.zeros_like(i),
                "scale": lambda i: jnp.exp(-0.5 + 0.4 * i),
            },
            coding_rank=1,
            compression=True,
            num_noise_levels=4,
        )
        yv = jnp.asarray(np.random.RandomState(14).randn(25))
        idx = jnp.asarray(np.random.RandomState(15).randint(0, 6, 25).astype(float))
        yv_eval, _ = idx_model(yv, idx, training=False)
        yv_codec = idx_model.decompress(
            idx_model.compress(yv[None], idx[None]), idx[None]
        )[0]
        np.testing.assert_allclose(
            np.asarray(yv_eval), np.asarray(yv_codec), atol=1e-5
        )

    def test_batched_expected_grads(self):
        """perturb_and_apply path: rate gradient is the exact expected one."""
        prior = _make_prior(2, seed=11)
        model = em.UniversalBatchedEntropyModel(prior, coding_rank=1)
        y = jnp.asarray([0.3, -1.2])

        def loss(yy):
            _, bits = model(yy, rng=jax.random.PRNGKey(0), training=True)
            return jnp.sum(bits)

        g = np.asarray(jax.grad(loss)(y))
        # Expected gradient: d/dy E[-log2 p(y+u)] = -(log2 p(y+.5)-log2 p(y-.5))
        lp = lambda t: np.asarray(prior.log_prob(jnp.asarray(t))) / np.log(2)  # noqa: E731
        want = -(lp(np.asarray(y) + 0.5) - lp(np.asarray(y) - 0.5))
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-6)

    def test_indexed_expected_grads_flow_to_indexes(self):
        model = em.UniversalIndexedEntropyModel(
            prior_fn=lambda loc, scale: NoisyNormal(loc=loc, scale=scale),
            index_ranges=(8,),
            parameter_fns={
                "loc": lambda i: jnp.zeros_like(i),
                "scale": lambda i: jnp.exp(-1.0 + 0.5 * i),
            },
            coding_rank=1,
        )
        y = jnp.asarray(np.random.RandomState(20).randn(16))
        idx = jnp.asarray(np.random.RandomState(21).uniform(1, 6, 16))

        def loss(ii):
            _, bits = model(y, ii, rng=jax.random.PRNGKey(0), training=True)
            return jnp.sum(bits)

        g = np.asarray(jax.grad(loss)(idx))
        assert np.all(np.isfinite(g)) and np.any(g != 0)

    def test_indexed_roundtrip(self):
        model = em.UniversalIndexedEntropyModel(
            prior_fn=lambda loc, scale: NoisyNormal(loc=loc, scale=scale),
            index_ranges=(8,),
            parameter_fns={
                "loc": lambda i: jnp.zeros_like(i),
                "scale": lambda i: jnp.exp(-1.0 + 0.5 * i),
            },
            coding_rank=1,
            compression=True,
            num_noise_levels=5,
        )
        rng = np.random.RandomState(7)
        y = jnp.asarray(rng.randn(2, 30) * 2)
        idx = jnp.asarray(rng.randint(0, 8, (2, 30)).astype(np.float64))
        strings = model.compress(y, idx)
        y_hat = model.decompress(strings, idx)
        err = np.abs(np.asarray(y_hat) - np.asarray(y))
        assert err.max() <= 0.5 + 1e-6


class TestPowerLaw:
    def test_penalty_and_roundtrip(self):
        model = em.PowerLawEntropyModel(coding_rank=1)
        x = jnp.asarray(np.random.RandomState(8).randn(200) * 5)
        p = model.penalty(x)
        assert p.shape == () and float(p) > 0
        strings = model.compress(x)
        x_hat = model.decompress(strings, (200,))
        np.testing.assert_array_equal(
            np.asarray(x_hat), np.round(np.asarray(x))
        )

    def test_sparse_costs_less(self):
        model = em.PowerLawEntropyModel(coding_rank=1)
        dense = jnp.asarray(np.random.RandomState(9).randn(500) * 10)
        sparse = dense * (jnp.arange(500) % 50 == 0)
        assert float(model.penalty(sparse)) < float(model.penalty(dense))
        s_dense = model.compress(dense)[0]
        s_sparse = model.compress(sparse)[0]
        assert len(s_sparse) < len(s_dense)
