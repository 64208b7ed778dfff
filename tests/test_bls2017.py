"""End-to-end slice test: bls2017 train step + compress/decompress round trip.

This is the acceptance test for the minimum end-to-end slice (SURVEY.md §7):
device transforms, table build, host-callback coding, bitstream container,
and the train verb all exercised in one model.
"""

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import bls2017
from compression_tpu.models import common


def _tiny_cfg():
    return bls2017.Config(lmbda=0.01, num_filters=8)


def _init(model, patch=32, batch=2, seed=0):
    x = jnp.zeros((batch, patch, patch, 3))
    params = model.init(
        jax.random.PRNGKey(seed), x, jax.random.PRNGKey(1), training=True
    )
    return params


def test_forward_and_loss_grads():
    model = bls2017.BLS2017Model(_tiny_cfg())
    params = _init(model)
    loss_fn = bls2017.make_loss_fn(model)
    batch = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    assert float(metrics["bpp"]) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # Prior parameters must receive gradient (rate term).
    prior_grads = jax.tree_util.tree_leaves(grads["params"]["prior"])
    assert any(np.any(np.asarray(g) != 0) for g in prior_grads)


def test_compress_decompress_roundtrip():
    model = bls2017.BLS2017Model(_tiny_cfg())
    params = _init(model)
    image = (np.random.RandomState(1).rand(37, 45, 3) * 255).astype(np.uint8)
    data = bls2017.compress(model, params, image)
    assert isinstance(data, bytes) and len(data) > 0
    out = bls2017.decompress(model, params, data)
    assert out.shape == image.shape and out.dtype == np.uint8
    # Untrained model won't reconstruct well, but the latent round-trip must
    # be exact: re-compressing the same image gives identical bytes.
    data2 = bls2017.compress(model, params, image)
    assert data == data2


def test_train_smoke_synthetic():
    cfg = _tiny_cfg()
    tc = common.TrainConfig(
        train_glob=None, batch_size=2, patch_size=32, steps=3, log_every=1
    )
    model, params = bls2017.train(cfg, tc)
    assert params is not None


def test_train_smoke_image_backed_uint8_wire(tmp_path):
    """Training on PNG-backed data: batches travel uint8 (4x less
    host->device traffic; normalization happens inside the jitted step)
    and the loop still trains. Guards the uint8-on-the-wire pipeline."""
    from compression_tpu.util import image as image_util

    rng = np.random.RandomState(3)
    for i in range(2):
        image_util.write_png(
            str(tmp_path / f"{i}.png"),
            rng.randint(0, 256, (48, 48, 3)).astype(np.uint8),
        )
    cfg = _tiny_cfg()
    tc = common.TrainConfig(
        train_glob=str(tmp_path / "*.png"),
        batch_size=2, patch_size=32, steps=3, log_every=1,
    )
    batch = next(common.crop_dataset(tc))
    assert batch.dtype == np.uint8  # the wire format under test
    model, params = bls2017.train(cfg, tc)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
