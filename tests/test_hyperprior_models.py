"""bmshj2018 + mbt2018: forward, gradients, and coding round trips."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from compression_tpu.models import bmshj2018, mbt2018


def _tiny_bmshj():
    return bmshj2018.Config(num_filters=8, num_latents=8, num_hyperlatents=4)


def _tiny_mbt():
    return mbt2018.Config(num_filters=8, num_latents=8, num_hyperlatents=4)


class TestBMSHJ2018:
    def test_forward_and_grads(self):
        model = bmshj2018.BMSHJ2018Model(_tiny_bmshj())
        x = jnp.asarray(
            np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32
        )
        params = model.init(
            jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), training=True
        )
        loss_fn = bmshj2018.make_loss_fn(model)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(loss)) and float(metrics["bpp"]) > 0
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # Hyper-synthesis must receive gradient through the y rate term.
        hs = jax.tree_util.tree_leaves(grads["params"]["hyper_synthesis"])
        assert any(np.any(np.asarray(g) != 0) for g in hs)

    def test_roundtrip(self):
        model = bmshj2018.BMSHJ2018Model(_tiny_bmshj())
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
        image = (np.random.RandomState(1).rand(70, 91, 3) * 255).astype(
            np.uint8
        )
        data = bmshj2018.compress(model, params, image)
        out = bmshj2018.decompress(model, params, data)
        assert out.shape == image.shape and out.dtype == np.uint8
        assert data == bmshj2018.compress(model, params, image)

    def test_batched_matches_single(self):
        """compress_batch/decompress_batch: byte-identical to per-image."""
        model = bmshj2018.BMSHJ2018Model(_tiny_bmshj())
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
        rng = np.random.RandomState(7)
        images = (rng.rand(3, 64, 64, 3) * 255).astype(np.uint8)
        codec = bmshj2018.make_codec(model, params)
        blobs = codec.compress_batch(images)
        for i in range(3):
            assert blobs[i] == codec.compress(images[i])
        recon = codec.decompress_batch(blobs)
        for i in range(3):
            np.testing.assert_array_equal(recon[i], codec.decompress(blobs[i]))


class TestMBT2018:
    def test_forward_and_grads(self):
        model = mbt2018.MBT2018Model(_tiny_mbt())
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
        )
        params = model.init(
            jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), training=True
        )
        loss_fn = mbt2018.make_loss_fn(model)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)

    def test_roundtrip_with_mean(self):
        model = mbt2018.MBT2018Model(_tiny_mbt())
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
        image = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(
            np.uint8
        )
        data = mbt2018.compress(model, params, image)
        out = mbt2018.decompress(model, params, data)
        assert out.shape == image.shape
        assert data == mbt2018.compress(model, params, image)


def test_metrics_psnr_msssim():
    from compression_tpu.util import image as im

    a = np.random.RandomState(3).rand(1, 192, 192, 3) * 255
    assert float(im.psnr(a, a)[0]) > 80
    m = im.msssim(jnp.asarray(a, jnp.float32), jnp.asarray(a, jnp.float32))
    assert float(m[0]) == pytest.approx(1.0, abs=1e-5)
    noisy = a + np.random.RandomState(4).randn(*a.shape) * 10
    assert float(im.psnr(a, noisy)[0]) < 35
    assert float(im.msssim(jnp.asarray(a, jnp.float32), jnp.asarray(noisy, jnp.float32))[0]) < 1.0


def test_msssim_training_gradient_safe():
    """msssim as a TRAINING loss: gradients stay finite and bounded even
    when a scale's contrast term touches <= 0 (anti-correlated inputs),
    where the exact relu-clamped power's gradient blows up / NaNs.
    Root cause of the round-3 ms2020-msssim-q5 freeze (16.45 dB)."""
    from compression_tpu.util import image as im

    rs = np.random.RandomState(7)
    base = rs.rand(1, 192, 192, 3).astype(np.float32)

    def loss(b):
        return 1.0 - jnp.mean(im.msssim(jnp.asarray(base), b, max_val=1.0))

    # Anti-correlated reconstruction drives sigma_ab < 0 -> cs <= 0.
    g = jax.grad(loss)(jnp.asarray(1.0 - base))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) < 1e3
    # Exactly at the clamp point (identical flat images -> variance 0 at
    # machine precision can sit at the relu corner).
    flat = jnp.full((1, 192, 192, 3), 0.5, jnp.float32)
    g2 = jax.grad(lambda b: 1.0 - jnp.mean(im.msssim(flat, b, max_val=1.0)))(flat)
    assert np.all(np.isfinite(np.asarray(g2)))
    # Value is EXACTLY the relu-clamped spec (gradient path only differs).
    pts = jnp.asarray([-0.5, 0.0, 1e-3, 0.5, 1.0], jnp.float32)
    v = im._weighted_term(pts, 0.0448)
    expect = jnp.maximum(pts, 0.0) ** 0.0448
    np.testing.assert_array_equal(np.asarray(v), np.asarray(expect))


def _np_msssim_f64(a, b, max_val=255.0):
    """Float64 NumPy executable spec of msssim (Wang et al. 2003), used to
    pin the JAX implementation's numerics. Mirrors util/image.py: 11-tap
    sigma-1.5 Gaussian, valid padding, count-normalized 2x2 pooling."""
    from scipy.signal import convolve

    x1 = np.arange(11, dtype=np.float64) - 5.0
    g = np.exp(-(x1**2) / (2 * 1.5**2))
    g /= g.sum()
    win = np.outer(g, g)
    weights = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

    def filt(x):
        return np.stack(
            [convolve(x[..., c], win, mode="valid") for c in range(x.shape[-1])], -1
        )

    def pool(x):
        h, w, c = x.shape
        x2 = np.full((h + h % 2, w + w % 2, c), np.nan)
        x2[:h, :w] = x
        return np.nanmean(
            x2.reshape(x2.shape[0] // 2, 2, x2.shape[1] // 2, 2, c), axis=(1, 3)
        )

    a = np.asarray(a, np.float64) / max_val
    b = np.asarray(b, np.float64) / max_val
    c1, c2 = 0.01**2, 0.03**2
    out = 1.0
    for i, w in enumerate(weights):
        mu_a, mu_b = filt(a), filt(b)
        s_aa = filt(a * a) - mu_a**2
        s_bb = filt(b * b) - mu_b**2
        s_ab = filt(a * b) - mu_a * mu_b
        cs = np.mean((2 * s_ab + c2) / (s_aa + s_bb + c2))
        lum_cs = np.mean(
            (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
            * (2 * s_ab + c2) / (s_aa + s_bb + c2)
        )
        v = lum_cs if i == len(weights) - 1 else cs
        out *= max(v, 0.0) ** w
        if i < len(weights) - 1:
            a, b = pool(a), pool(b)
    return out


def test_msssim_matches_float64_reference():
    """The float32 JAX msssim must track a float64 NumPy spec to ~1e-4 at
    255-scale inputs. Guards against the round-3 regression class where
    low-precision convs made E[x^2]-mu^2 cancel (observed msssim 1.0037 and
    hard-0.0 rows in results/synthetic before the fix)."""
    from compression_tpu.util import image as im

    rng = np.random.RandomState(7)
    a = rng.rand(200, 184, 3) * 255
    for b in (
        a + rng.randn(*a.shape) * 8,               # mild noise
        np.clip(a * 0.9 + 20 + rng.randn(*a.shape) * 25, 0, 255),  # heavy
    ):
        want = _np_msssim_f64(a, b)
        got = float(im.msssim(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
        assert got == pytest.approx(want, abs=2e-4), (got, want)
        assert 0.0 < got <= 1.0 + 1e-5


def test_pipelined_iter_matches_serial():
    """compress_iter/decompress_iter (double-buffered device/host pipeline)
    must be byte-identical to the one-shot batch paths, in order."""
    model = bmshj2018.BMSHJ2018Model(_tiny_bmshj())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    rng = np.random.RandomState(11)
    batches = [
        (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8) for _ in range(4)
    ]
    codec = bmshj2018.make_codec(model, params)
    serial_blobs = [codec.compress_batch(b) for b in batches]
    piped_blobs = list(codec.compress_iter(iter(batches), depth=2))
    assert piped_blobs == serial_blobs
    serial_out = [codec.decompress_batch(bl) for bl in serial_blobs]
    piped_out = list(codec.decompress_iter(iter(piped_blobs), depth=2))
    for a, b in zip(serial_out, piped_out):
        np.testing.assert_array_equal(a, b)
    # Stage accounting exists for every pipeline stage.
    for stage in ("enc/dispatch", "enc/code_y", "dec/code_y", "dec/synth"):
        assert codec.timer.counts[stage] > 0


def test_symbol_slimming_overflow_fallback():
    """Symbols outside int8 (and int16) still round-trip exactly: the fit
    flags must trigger the wider refetch path."""
    model = bmshj2018.BMSHJ2018Model(_tiny_bmshj())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
    )
    codec = bmshj2018.make_codec(model, params)
    # Extreme image drives latents far out of the int8 symbol range for a
    # random-init model; exactness of the round-trip is what matters.
    image = np.full((64, 64, 3), 255, np.uint8)
    image[::2] = 0
    blob = codec.compress(image)
    out = codec.decompress(blob)
    assert out.shape == image.shape
    assert blob == codec.compress(image)


def test_slim_dtype_selection():
    slim = bmshj2018.Codec._slim
    arr = lambda v: np.array(v, np.int32)  # noqa: E731 — decode output dtype
    assert slim(arr([[-5, 100]])).dtype == np.int8
    assert slim(arr([[-5, 200]])).dtype == np.int16
    assert slim(arr([[-5, 40000]])).dtype == np.int32
    assert slim(arr([[-40000, 5]])).dtype == np.int32


def test_msssim_distortion_training():
    """-msssim model variants (reference models/tfci.py name list): the
    distortion knob trains against 1 - (MS-)SSIM with finite grads."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from compression_tpu.models import bmshj2018

    cfg = bmshj2018.Config(
        num_filters=8, num_latents=8, num_hyperlatents=4,
        distortion="msssim", lmbda=31.73,
    )
    model = bmshj2018.BMSHJ2018Model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), training=True
    )
    loss_fn = bmshj2018.make_loss_fn(model)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, x, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    assert "msssim" in metrics and -1.0 <= float(metrics["msssim"]) <= 1.0
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )

    from compression_tpu.cli import registry

    entry, _ = registry.resolve("bmshj2018-hyperprior-msssim-5")
    assert entry.config.distortion == "msssim"
    assert entry.config.lmbda == 31.73
    entry, _ = registry.resolve("ms2020-cc10-msssim-2")
    assert entry.config.distortion == "msssim"
