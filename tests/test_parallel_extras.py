"""Pipeline overlap, spatial halo conv, and toy-source tests."""

import numpy as np
import jax
import jax.numpy as jnp


def test_pipeline_preserves_order_and_results():
    from compression_tpu.parallel.pipeline import pipeline_map

    dev = jax.jit(lambda x: x * 2)
    host = lambda a: int(np.asarray(a).sum())  # noqa: E731
    batches = [jnp.full((4,), i) for i in range(10)]
    out = pipeline_map(dev, host, batches, depth=3)
    assert out == [i * 8 for i in range(10)]


def test_sharded_conv_matches_dense():
    from compression_tpu.parallel.data_parallel import make_mesh
    from compression_tpu.parallel.spatial import sharded_signal_conv2d
    from compression_tpu.layers.signal_conv import signal_conv

    mesh = make_mesh(4, "data")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 16, 3))
    kernel = jnp.asarray(rng.randn(5, 3, 3, 4))
    want = signal_conv(x, kernel, corr=True, padding="same_zeros")
    got = sharded_signal_conv2d(x, kernel, mesh, "data", corr=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_sharded_conv_even_kernel():
    from compression_tpu.parallel.data_parallel import make_mesh
    from compression_tpu.parallel.spatial import sharded_signal_conv2d
    from compression_tpu.layers.signal_conv import signal_conv

    mesh = make_mesh(2, "data")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 8, 2))
    kernel = jnp.asarray(rng.randn(4, 4, 2, 2))
    want = signal_conv(x, kernel, corr=True, padding="same_zeros")
    got = sharded_signal_conv2d(x, kernel, mesh, "data", corr=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_toy_sources_train_and_roundtrip():
    from compression_tpu.models import toy_sources as toy

    cfg = toy.Config(hidden=16, layers=2, lmbda=10.0)
    model, params, history = toy.train(cfg, steps=30, batch_size=128)
    assert history  # logged
    x = toy.banana(jax.random.PRNGKey(5), 64)
    x_hat, strings = toy.compress_samples(model, params, x)
    assert x_hat.shape == x.shape
    assert len(strings) == 64
    assert sum(len(s) for s in strings) > 0


def test_stage_timer_report():
    from compression_tpu.util.profiling import StageTimer

    t = StageTimer()
    with t.stage("encode"):
        pass
    with t.stage("encode"):
        pass
    with t.stage("decode"):
        pass
    rep = t.report()
    assert "encode" in rep and "decode" in rep
    assert t.counts["encode"] == 2
