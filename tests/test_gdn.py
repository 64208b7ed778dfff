"""GDN layer tests (role of reference gdn_test.py / parameters_test.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.layers import GDN
from compression_tpu.layers import parameters


def _init_apply(m, x):
    params = m.init(jax.random.PRNGKey(0), x)
    return params, m.apply(params, x)


def test_forward_matches_formula():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 5))
    m = GDN()
    params, y = _init_apply(m, x)
    beta = parameters.nonneg_apply(params["params"]["beta"], 1e-6)
    gamma = parameters.nonneg_apply(params["params"]["gamma"], 0.0)
    want = np.asarray(x) / np.sqrt(
        np.asarray(beta) + np.tensordot(np.asarray(x) ** 2, np.asarray(gamma), ([-1], [0]))
    )
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6)


def test_inverse_undoes_forward_at_init():
    # At init beta=1, gamma=0.1*I; IGDN(GDN(x)) is not exactly x (norm pools
    # differ), but GDN then IGDN with the same params on the *same* input
    # signature should invert when gamma=0: check the diagonal-only case.
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 3, 4))
    fwd = GDN(gamma_init=0.0)
    inv = GDN(gamma_init=0.0, inverse=True)
    pf, y = _init_apply(fwd, x)
    z = inv.apply(pf, y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), rtol=1e-5)


def test_rectify_and_alpha_one():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 2, 2, 3))
    m = GDN(rectify=True, alpha=1.0, epsilon=1.0)
    _, y = _init_apply(m, x)
    assert np.all(np.asarray(y) >= 0)


def test_beta_stays_above_minimum_under_gradient():
    """The sqrt reparam + lower bound keeps effective beta >= beta_min."""
    x = jnp.ones((1, 2, 2, 3))
    m = GDN(beta_min=1e-6)
    params = m.init(jax.random.PRNGKey(0), x)
    # Force beta_var far below its bound, as a rogue optimizer might.
    bad = jax.tree_util.tree_map(lambda a: a, params)
    bad["params"]["beta"] = jnp.full_like(bad["params"]["beta"], -5.0)
    beta_eff = parameters.nonneg_apply(bad["params"]["beta"], 1e-6)
    assert np.all(np.asarray(beta_eff) >= 1e-6 - 1e-12)
    y = m.apply(bad, x)
    assert np.all(np.isfinite(np.asarray(y)))


def test_nonneg_roundtrip():
    vals = jnp.asarray([0.0, 1e-8, 0.5, 3.0])
    stored = parameters.nonneg_init(vals)
    back = parameters.nonneg_apply(stored, 0.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vals), atol=1e-9)


def test_rdft_basis_orthonormal():
    for n in (1, 2, 3, 9, 25):
        b = parameters.rdft_basis(n)
        np.testing.assert_allclose(b @ b.T, np.eye(n), atol=1e-10)
