"""Multi-device CHARM decode (parallel/charm_sharded.py): the image batch
sharded over the 8-device CPU mesh must decode byte-exactly equal to the
single-device lockstep path (BASELINE config #4's "across chips" half)."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import ms2020
from compression_tpu.parallel import ShardedCharmCodec, make_mesh

pytestmark = pytest.mark.slow  # multi-minute: virtual-mesh compiles / model-scale jits



def _tiny_cfg():
    return ms2020.Config(
        num_filters=8, num_latents=8, num_hyperlatents=4, num_slices=4
    )


def test_sharded_decode_matches_single_device():
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    rng = np.random.RandomState(7)
    images = (rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)
    codec = ms2020.make_codec(model, params)
    blobs = codec.compress_batch(images)

    mesh = make_mesh(8)
    sharded = ShardedCharmCodec(model, params, mesh)
    out = sharded.decompress_batch(blobs)
    ref = codec.decompress_batch(blobs)
    np.testing.assert_array_equal(out, ref)

    # Pre-synthesis intermediates really were mesh-sharded (not silently
    # gathered to one device): re-run the first slice step by hand and
    # check the sharding of the slice-parameter output.
    slice_strings, z_strings, _, zshape = codec._parse_blobs(blobs)
    z_hat = sharded._shard(
        jax.device_get(
            codec.side_em.decompress(z_strings, tuple(int(v) for v in zshape))
        )
    )
    mu_sup, _ = codec._jit_supports(sharded._p, z_hat)
    assert len(mu_sup.sharding.device_set) == 8
    assert mu_sup.sharding.spec[0] == "data"


def test_sharded_decode_device_coded_blobs():
    """rANS (device-coded) blobs route through the sharded decode too and
    match the single-device rANS decode byte-for-byte."""
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    rng = np.random.RandomState(11)
    images = (rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)
    codec = ms2020.make_codec(model, params)
    blobs = codec.compress_batch(images, coder="device")
    assert codec._is_device_coded(blobs[0])
    sharded = ShardedCharmCodec(model, params, make_mesh(8))
    out = sharded.decompress_batch(blobs)
    ref = codec.decompress_batch(blobs)
    np.testing.assert_array_equal(out, ref)


def test_sharded_decode_rejects_empty_and_mixed():
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    codec = ms2020.make_codec(model, params)
    sharded = ShardedCharmCodec(model, params, make_mesh(8))
    with pytest.raises(ValueError, match="at least one blob"):
        sharded.decompress_batch([])
    rng = np.random.RandomState(12)
    images = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    host = codec.compress_batch(images)
    dev = codec.compress_batch(images, coder="device")
    with pytest.raises(ValueError, match="cannot mix"):
        sharded.decompress_batch([host[0], dev[1]])
    with pytest.raises(ValueError, match="cannot mix"):
        sharded.decompress_batch([dev[0], host[1]])


def test_sharded_decode_pads_ragged_batches():
    """A batch that doesn't divide the mesh is padded internally and the
    padding dropped — results must still match per-image decode."""
    model = ms2020.MS2020Model(_tiny_cfg())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    rng = np.random.RandomState(9)
    images = (rng.rand(5, 64, 64, 3) * 255).astype(np.uint8)
    codec = ms2020.make_codec(model, params)
    blobs = codec.compress_batch(images)
    sharded = ShardedCharmCodec(model, params, make_mesh(8))
    out = sharded.decompress_batch(blobs)
    assert out.shape[0] == 5
    for i in range(5):
        np.testing.assert_array_equal(out[i], codec.decompress(blobs[i]))
