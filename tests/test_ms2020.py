"""ms2020 CHARM: forward, gradients, and the 10-slice serial round trip."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import ms2020

pytestmark = pytest.mark.slow  # multi-minute: virtual-mesh compiles / model-scale jits



def _tiny_cfg():
    return ms2020.Config(
        num_filters=8, num_latents=8, num_hyperlatents=4, num_slices=4
    )


def test_forward_and_grads():
    model = ms2020.MS2020Model(_tiny_cfg())
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), training=True
    )
    loss_fn = ms2020.make_loss_fn(model)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, x, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss)) and float(metrics["bpp"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # Slice transforms participate (autoregressive conditioning is live).
    st = jax.tree_util.tree_leaves(grads["params"]["mean_t1"])
    assert any(np.any(np.asarray(g) != 0) for g in st)


def test_pipelined_batch_decode_matches_serial():
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    rng = np.random.RandomState(3)
    blobs = [
        ms2020.compress(
            model, params,
            (rng.rand(64, 64, 3) * 255).astype(np.uint8),
        )
        for _ in range(3)
    ]
    from compression_tpu.parallel.charm_pipeline import (
        decompress_batch_pipelined,
    )

    out = decompress_batch_pipelined(model, params, blobs, depth=2)
    for blob, img in zip(blobs, out):
        np.testing.assert_array_equal(
            img, ms2020.decompress(model, params, blob)
        )


def test_roundtrip_serial_slices():
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    image = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    data = ms2020.compress(model, params, image)
    out = ms2020.decompress(model, params, data)
    assert out.shape == image.shape and out.dtype == np.uint8
    # Deterministic: encoder-side reconstruction == decoder-side.
    assert data == ms2020.compress(model, params, image)


def test_batched_encode_decode_match_single():
    """compress_batch/decompress_batch (slice-batched lockstep) must be
    byte-identical to the per-image paths."""
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    rng = np.random.RandomState(5)
    images = (rng.rand(3, 64, 64, 3) * 255).astype(np.uint8)
    codec = ms2020.make_codec(model, params)
    blobs = codec.compress_batch(images)
    for i in range(3):
        assert blobs[i] == codec.compress(images[i])
    recon = codec.decompress_batch(blobs)
    for i in range(3):
        np.testing.assert_array_equal(recon[i], codec.decompress(blobs[i]))
    # Streaming variants preserve order and results.
    batches = [images[:2], images[2:]]
    piped = list(codec.compress_iter(iter(batches), depth=2))
    assert piped[0] == blobs[:2] and piped[1] == blobs[2:]
    outs = list(codec.decompress_iter(iter(piped), depth=2))
    np.testing.assert_array_equal(
        np.concatenate([outs[0], outs[1]]), recon
    )
