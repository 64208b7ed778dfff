"""b2018 variable-rate model: one checkpoint serving multiple rate points
(reference: models/tfci.py b2018-* + --rd_parameter runtime quality)."""

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import b2018
from compression_tpu.models import common


def _tiny_cfg(**kw):
    return b2018.Config(num_filters=8, **kw)


def _init(model, patch=32, batch=2, seed=0):
    x = jnp.zeros((batch, patch, patch, 3))
    return model.init(
        jax.random.PRNGKey(seed), x, jax.random.PRNGKey(1), 0, training=True
    )


def test_forward_and_loss_grads_all_qualities():
    model = b2018.B2018Model(_tiny_cfg())
    params = _init(model)
    batch = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32
    )
    # Every rate point is a valid traced index through the shared step.
    fwd = jax.jit(
        lambda p, x, q: model.apply(
            p, x, jax.random.PRNGKey(2), q, training=True
        )
    )
    for q in range(model.config.num_qualities):
        x_hat, bits = fwd(params, batch, q)
        assert x_hat.shape == batch.shape
        assert np.isfinite(float(jnp.mean(bits)))

    loss_fn = b2018.make_loss_fn(model)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss)) and float(metrics["bpp"]) > 0
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )
    # The sampled quality's gain vector receives gradient.
    assert np.any(np.asarray(grads["params"]["gain"]) != 0)


def test_roundtrip_at_each_rate_point():
    """ONE params pytree serves every rate point — including through the
    params-keyed codec cache (quality travels per call, so switching
    quality over the same checkpoint must not reuse the previous rate
    point's encoder; round-2 review finding)."""
    import dataclasses

    cfg = _tiny_cfg()
    image = (np.random.RandomState(1).rand(37, 45, 3) * 255).astype(np.uint8)
    base_model = b2018.B2018Model(dataclasses.replace(cfg, quality=1))
    params = _init(base_model)  # shared across qualities, like a real ckpt
    from compression_tpu.util import PackedTensors

    for quality in (1, cfg.num_qualities):
        m = b2018.B2018Model(
            dataclasses.replace(
                cfg, quality=quality,
                model_name=f"{cfg.model_name}-{quality}",
            )
        )
        data = b2018.compress(m, params, image)
        assert isinstance(data, bytes) and len(data) > 0
        # The packed blob self-describes the REQUESTED rate point.
        assert PackedTensors(data).model == f"{cfg.model_name}-{quality}"
        out = b2018.decompress(m, params, data)
        assert out.shape == image.shape and out.dtype == np.uint8
        assert data == b2018.compress(m, params, image)  # deterministic


def test_quality_required_for_compress():
    model = b2018.B2018Model(_tiny_cfg())  # quality=0 (unset)
    params = _init(model)
    image = np.zeros((32, 32, 3), np.uint8)
    try:
        b2018.compress(model, params, image)
        raise AssertionError("expected ValueError for unset quality")
    except ValueError as e:
        assert "quality" in str(e)


def test_train_smoke_synthetic():
    tc = common.TrainConfig(
        train_glob=None, batch_size=2, patch_size=32, steps=3, log_every=1
    )
    model, params = b2018.train(_tiny_cfg(), tc)
    assert params is not None


def test_registry_variable_rate_resolution(tmp_path, monkeypatch):
    """Quality-suffixed b2018 names resolve to ONE shared checkpoint with the
    suffix as the runtime quality (not per-lambda checkpoints)."""
    monkeypatch.setenv("TPC_MODEL_DIR", str(tmp_path))
    monkeypatch.setenv("TPC_TINY_MODELS", "1")
    from compression_tpu.cli import registry

    entry, ckpt = registry.resolve("b2018-gdn-128-2")
    assert entry.config.quality == 2
    assert entry.config.model_name == "b2018-gdn-128-2"
    assert ckpt is None  # nothing trained yet
    assert registry.checkpoint_path("b2018-gdn-128-2") == str(
        tmp_path / "b2018-gdn-128.msgpack"
    )
    assert registry.checkpoint_path("b2018-gdn-128-4") == str(
        tmp_path / "b2018-gdn-128.msgpack"
    )
    # Non-variable-rate families keep per-quality checkpoints.
    assert registry.checkpoint_path("bmshj2018-6") == str(
        tmp_path / "bmshj2018-6.msgpack"
    )
    entry2, _ = registry.resolve("b2018-leaky_relu-128-1")
    assert entry2.config.activation == "leaky_relu"
    assert entry2.config.quality == 1
