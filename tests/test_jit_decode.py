"""Fully-jitted bmshj2018 serving decode (Codec.decompress_batch_jit):
one compiled program with two pure_callback range-decodes must reproduce
the staged host-path decode byte-for-byte (VERDICT r2 item 6 — the in-jit
coding surface wired into a product path)."""

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import bmshj2018


def _tiny_model():
    cfg = bmshj2018.Config(num_filters=8, num_latents=8, num_hyperlatents=4)
    model = bmshj2018.BMSHJ2018Model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jax.random.PRNGKey(1),
        training=True,
    )
    return model, params


def test_jit_decode_matches_host_path():
    model, params = _tiny_model()
    codec = bmshj2018.make_codec(model, params)
    rng = np.random.RandomState(11)
    images = (rng.rand(2, 96, 128, 3) * 255).astype(np.uint8)
    blobs = codec.compress_batch(images)
    ref = codec.decompress_batch(blobs)
    out = codec.decompress_batch_jit(blobs)
    np.testing.assert_array_equal(out, ref)
    # Second call hits the compiled-program cache (same n/shape/capacity
    # bucket) and stays correct.
    assert len(codec._jit_decoders) == 1
    np.testing.assert_array_equal(codec.decompress_batch_jit(blobs), ref)
    assert len(codec._jit_decoders) == 1


def test_jit_decode_single_image_other_shape():
    model, params = _tiny_model()
    codec = bmshj2018.make_codec(model, params)
    image = (np.random.RandomState(3).rand(64, 64, 3) * 255).astype(np.uint8)
    blob = codec.compress(image)
    out = codec.decompress_batch_jit([blob])
    np.testing.assert_array_equal(out[0], codec.decompress(blob))
