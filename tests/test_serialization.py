"""Serialization invariants (SURVEY.md §4 property 4): checkpoints and
CDF-table files must round-trip and preserve bitstreams exactly."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import bls2017, common


def test_checkpoint_roundtrip_preserves_bitstreams(tmp_path):
    cfg = bls2017.Config(num_filters=8)
    model = bls2017.BLS2017Model(cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    image = (np.random.RandomState(0).rand(48, 48, 3) * 255).astype(np.uint8)
    blob1 = bls2017.compress(model, params, image)

    path = str(tmp_path / "ckpt.msgpack")
    common.save_checkpoint(path, params, step=7)
    params2, step = common.load_checkpoint(path, params)
    assert step == 7
    blob2 = bls2017.compress(model, params2, image)
    assert blob1 == blob2
    out = bls2017.decompress(model, params2, blob1)
    np.testing.assert_array_equal(out, bls2017.decompress(model, params, blob1))


def test_checkpoint_with_opt_state(tmp_path):
    import optax

    cfg = bls2017.Config(num_filters=4)
    model = bls2017.BLS2017Model(cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    path = str(tmp_path / "ckpt.msgpack")
    common.save_checkpoint(path, params, step=3, opt_state=opt)
    p2, step, opt2 = common.load_checkpoint(path, params, opt)
    assert step == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(opt), jax.tree_util.tree_leaves(opt2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cdf_tables_npz_roundtrip(tmp_path):
    from compression_tpu.distributions.deep_factorized import DeepFactorized
    from compression_tpu.distributions.uniform_noise import UniformNoiseAdapter
    from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
    from compression_tpu.entropy_models.continuous_base import (
        load_tables,
        save_tables,
    )

    prior = UniformNoiseAdapter(
        DeepFactorized.create(jax.random.PRNGKey(3), (4,))
    )
    em = ContinuousBatchedEntropyModel(prior, coding_rank=1, compression=True)
    path = str(tmp_path / "tables.npz")
    save_tables(path, {"side": em.tables})
    back = load_tables(path)["side"]
    np.testing.assert_array_equal(back.cdf, em.tables.cdf)
    np.testing.assert_array_equal(back.cdf_length, em.tables.cdf_length)
    np.testing.assert_array_equal(back.cdf_offset, em.tables.cdf_offset)
    np.testing.assert_array_equal(back.offset, em.tables.offset)
    assert back.precision == em.tables.precision

    # An EM built from loaded tables codes identically.
    em2 = ContinuousBatchedEntropyModel(
        prior, coding_rank=1, compression=True, tables=back
    )
    y = jnp.asarray(np.random.RandomState(4).randn(3, 4) * 2)
    assert em.compress(y) == em2.compress(y)


def test_table_disk_cache_env(tmp_path, monkeypatch):
    from compression_tpu.models.codec_cache import tables_via_disk
    from compression_tpu.distributions.uniform_noise import NoisyNormal
    from compression_tpu.entropy_models import LocationScaleIndexedEntropyModel

    path = str(tmp_path / "cache.npz")
    monkeypatch.setenv("TPC_TABLE_CACHE_FILE", path)
    calls = []

    def build():
        calls.append(1)
        em = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=1)
        return {"main": em._em.build_tables()}

    t1 = tables_via_disk(build)
    assert os.path.exists(path) and len(calls) == 1
    t2 = tables_via_disk(build)
    assert len(calls) == 1  # second call loaded from disk
    np.testing.assert_array_equal(t1["main"].cdf, t2["main"].cdf)
