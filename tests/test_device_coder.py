"""bmshj2018 device-coded (on-TPU rANS) product path: reconstruction must
equal the host-coded path exactly (same symbols, same synthesis), blobs
self-describe their format, and the streaming/pipelined paths route both
formats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compression_tpu.models import bmshj2018
from compression_tpu.util import PackedTensors


def _tiny_codec():
    cfg = bmshj2018.Config(num_filters=8, num_latents=8, num_hyperlatents=4)
    model = bmshj2018.BMSHJ2018Model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jax.random.PRNGKey(1),
        training=True,
    )
    return bmshj2018.make_codec(model, params)


def test_device_coded_roundtrip_matches_host():
    codec = _tiny_codec()
    rng = np.random.RandomState(21)
    images = (rng.rand(3, 96, 128, 3) * 255).astype(np.uint8)
    host_blobs = codec.compress_batch(images)
    dev_blobs = codec.compress_batch(images, coder="device")
    # Formats self-describe: 4 fields host, 5 fields device.
    assert not codec._is_device_coded(host_blobs[0])
    assert codec._is_device_coded(dev_blobs[0])
    assert PackedTensors(dev_blobs[0]).model == codec.cfg.model_name
    # Same symbols -> identical reconstructions from either format.
    ref = codec.decompress_batch(host_blobs)
    out = codec.decompress_batch(dev_blobs)
    np.testing.assert_array_equal(out, ref)
    # Determinism.
    assert dev_blobs == codec.compress_batch(images, coder="device")
    # Single-blob path auto-detects too.
    np.testing.assert_array_equal(codec.decompress(dev_blobs[1]), ref[1])


def test_device_coded_iter_paths():
    codec = _tiny_codec()
    rng = np.random.RandomState(22)
    images = (rng.rand(4, 64, 64, 3) * 255).astype(np.uint8)
    batches = [images[:2], images[2:]]
    dev = [
        blobs
        for blobs in codec.compress_iter(
            iter(batches), depth=2, coder="device"
        )
    ]
    assert all(codec._is_device_coded(b) for blobs in dev for b in blobs)
    outs = list(codec.decompress_iter(iter(dev), depth=2))
    ref = codec.decompress_batch(codec.compress_batch(images))
    np.testing.assert_array_equal(np.concatenate(outs), ref)


def test_device_coded_stream_is_compact():
    """The device blob's y stream must be comparable to the host coder's
    y string (same tables; rANS pays only lane-state overhead), not the
    raw symbol volume."""
    codec = _tiny_codec()
    image = (np.random.RandomState(5).rand(128, 128, 3) * 255).astype(
        np.uint8
    )
    host = PackedTensors(codec.compress(image))
    dev = PackedTensors(codec.compress(image, coder="device"))
    host_y = len(host.unpack_one(0, object)[0])
    dev_y = len(dev.unpack_one(0, object)[0])
    K = int(dev.unpack_one(4, np.int32)[0])
    assert dev_y <= host_y * 1.1 + 4 * K + 16


def test_charm_device_coded_matches_host():
    """ms2020 device-coded slice streams: identical reconstruction to the
    host-coded format, deterministic, auto-detected, zero host-coder
    round-trips in the slice chain."""
    from compression_tpu.models import ms2020

    cfg = ms2020.Config(
        num_filters=8, num_latents=8, num_hyperlatents=4, num_slices=4
    )
    model = ms2020.MS2020Model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jax.random.PRNGKey(1),
        training=True,
    )
    codec = ms2020.make_codec(model, params)
    rng = np.random.RandomState(31)
    images = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    host_blobs = codec.compress_batch(images)
    dev_blobs = codec.compress_batch(images, coder="device")
    assert codec._is_device_coded(dev_blobs[0])
    assert not codec._is_device_coded(host_blobs[0])
    ref = codec.decompress_batch(host_blobs)
    out = codec.decompress_batch(dev_blobs)
    np.testing.assert_array_equal(out, ref)
    assert dev_blobs == codec.compress_batch(images, coder="device")
    np.testing.assert_array_equal(codec.decompress(dev_blobs[1]), ref[1])
    # Pipelined encode path routes the device coder too.
    piped = list(
        codec.compress_iter(iter([images]), depth=2, coder="device")
    )
    assert piped[0] == dev_blobs


def test_mbt2018_device_coded_matches_host():
    """Mean-scale family through the shared device-coding module: same
    reconstruction as the host format, deterministic, auto-detected."""
    from compression_tpu.models import mbt2018

    cfg = mbt2018.Config(num_filters=8, num_latents=8, num_hyperlatents=4)
    model = mbt2018.MBT2018Model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jax.random.PRNGKey(1),
        training=True,
    )
    codec = mbt2018.make_codec(model, params)
    rng = np.random.RandomState(41)
    images = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    host = codec.compress_batch(images)
    dev = codec.compress_batch(images, coder="device")
    ref = codec.decompress_batch(host)
    np.testing.assert_array_equal(codec.decompress_batch(dev), ref)
    assert dev == codec.compress_batch(images, coder="device")


def test_hific_device_coded_matches_host():
    from compression_tpu.models import hific

    cfg = hific.HificConfig(
        name="hific-test", target_rate=0.3, num_latents=8,
        num_hyperlatents=4, num_residual_blocks=1,
    )
    model = hific.HificModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jax.random.PRNGKey(1),
        training=True,
    )
    codec = hific.make_codec(model, params)
    rng = np.random.RandomState(43)
    images = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    host = codec.compress_batch(images)
    dev = codec.compress_batch(images, coder="device")
    ref = codec.decompress_batch(host)
    np.testing.assert_array_equal(codec.decompress_batch(dev), ref)
    np.testing.assert_array_equal(codec.decompress(dev[0]), ref[0])


def test_corrupt_device_stream_raises():
    codec = _tiny_codec()
    image = (np.random.RandomState(6).rand(64, 64, 3) * 255).astype(np.uint8)
    blob = codec.compress(image, coder="device")
    packed = PackedTensors(blob)
    fields = packed.unpack([object, object, np.int32, np.int32, np.int32])
    words = bytearray(bytes(fields[0][0]))
    words[len(words) // 2] ^= 0xFF
    bad = PackedTensors()
    bad.model = packed.model
    bad.pack([bytes(words)] + [
        bytes(fields[1][0]), np.asarray(fields[2]), np.asarray(fields[3]),
        np.asarray(fields[4]),
    ])
    with pytest.raises(ValueError, match="rANS"):
        codec.decompress(bad.string)


def test_batched_decode_rejects_mixed_formats_and_sizes():
    """A lockstep batched decode cannot silently mix coder formats or
    image sizes — both must raise a clear ValueError (previously the last
    blob's shape/K silently won and earlier blobs decoded as garbage)."""
    codec = _tiny_codec()
    rng = np.random.RandomState(31)
    small = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    big = (rng.rand(1, 64, 128, 3) * 255).astype(np.uint8)
    host_s = codec.compress_batch(small)[0]
    host_b = codec.compress_batch(big)[0]
    dev_s = codec.compress_batch(small, coder="device")[0]
    dev_b = codec.compress_batch(big, coder="device")[0]
    with pytest.raises(ValueError, match="cannot mix"):
        codec.decompress_batch([host_s, dev_s])
    with pytest.raises(ValueError, match="cannot mix"):
        codec.decompress_batch([dev_s, host_s])
    with pytest.raises(ValueError, match="same-size"):
        codec.decompress_batch([host_s, host_b])
    with pytest.raises(ValueError, match="same-size"):
        codec.decompress_batch([dev_s, dev_b])
    # mbt2018/HiFiC share the generic path via device_coding
    from compression_tpu.models import device_coding as dc

    with pytest.raises(ValueError, match="same-size"):
        dc.decompress_batch_rans(codec, [dev_s, dev_b])
    with pytest.raises(ValueError, match="cannot mix"):
        dc.parse_host_blobs([host_s, dev_s])
    with pytest.raises(ValueError, match="same-size"):
        dc.parse_host_blobs([host_s, host_b])


def test_rans_k_env_override_honored(monkeypatch):
    """TPC_RANS_K caps the auto-fit lane count all the way down to 1 —
    single-lane streams are the debugging/reference-comparison mode."""
    from compression_tpu.models import device_coding as dc

    codec = _tiny_codec()
    for want in ("1", "2"):
        monkeypatch.setenv("TPC_RANS_K", want)
        codec._rans_cache = {}
        _enc, _dec, K, _cap = dc.rans_for(codec, 4096)
        assert K == int(want)
    monkeypatch.setenv("TPC_RANS_K", "1")
    codec._rans_cache = {}
    image = (np.random.RandomState(33).rand(64, 64, 3) * 255).astype(
        np.uint8
    )
    blob = codec.compress(image, coder="device")
    ref = codec.decompress(codec.compress(image))
    np.testing.assert_array_equal(codec.decompress(blob), ref)
