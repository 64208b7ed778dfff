"""HiFiC: architecture shapes, joint G/D train step, coding round trip."""

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import hific


def _tiny_cfg():
    return hific.HificConfig(
        name="hific-test", target_rate=0.3, num_latents=8,
        num_hyperlatents=4, num_residual_blocks=1,
    )


def test_archs_shapes():
    enc = hific.Encoder(num_latents=8)
    x = jnp.zeros((1, 64, 64, 3))
    p = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(p, x)
    assert y.shape == (1, 4, 4, 8)  # 16x downsampling

    gen = hific.Generator(num_residual_blocks=1)
    pg = gen.init(jax.random.PRNGKey(1), y)
    x_hat = gen.apply(pg, y)
    assert x_hat.shape == (1, 64, 64, 3)

    disc = hific.Discriminator()
    pd = disc.init(jax.random.PRNGKey(2), x, y, update_stats=False)
    logits = disc.apply(pd, x, y, update_stats=False)
    assert logits.shape[0] == 1 and logits.shape[-1] == 1


def test_channel_norm_statistics():
    cn = hific.ChannelNorm()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 16) * 5 + 3)
    p = cn.init(jax.random.PRNGKey(0), x)
    y = np.asarray(cn.apply(p, x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-2)
    np.testing.assert_allclose(y.std(-1), 1.0, atol=0.05)


def test_joint_train_step_and_roundtrip():
    cfg = _tiny_cfg()
    model = hific.HificModel(cfg)
    disc = hific.Discriminator()
    from compression_tpu.models.hific.lpips import LPIPS

    lpips = LPIPS()
    batch = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    lp = lpips.init(jax.random.PRNGKey(3), batch, batch)
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    x_hat0, y_hat0, bpp0 = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    assert np.isfinite(float(bpp0))
    d_vars = disc.init(jax.random.PRNGKey(4), batch, y_hat0, update_stats=False)

    step, g_tx, d_tx = hific.make_train_steps(model, disc, lpips, lp, cfg)
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_vars["params"])
    g_params, d_vars, g_opt, d_opt, metrics = step(
        g_params, d_vars, g_opt, d_opt, batch, jax.random.PRNGKey(5)
    )
    for k in ("g_loss", "d_loss", "bpp", "lpips"):
        assert np.isfinite(float(metrics[k])), k

    image = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    data = hific.compress(model, g_params, image)
    out = hific.decompress(model, g_params, data)
    assert out.shape == image.shape
    assert data == hific.compress(model, g_params, image)


def test_configs():
    for name, rate in (("hific-lo", 0.14), ("hific-mi", 0.3), ("hific-hi", 0.45)):
        assert hific.get_config(name).target_rate == rate
