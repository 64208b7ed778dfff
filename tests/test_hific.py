"""HiFiC: architecture shapes, joint G/D train step, coding round trip."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from compression_tpu.models import hific

pytestmark = pytest.mark.slow  # multi-minute: virtual-mesh compiles / model-scale jits



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
    x_hat0, y_hat0, bpp0, hinge_bpp0 = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    assert np.isfinite(float(bpp0))
    assert np.isfinite(float(hinge_bpp0))
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


def test_coded_bpp_tracks_actual_coded_bytes():
    """The rate-probe statistic (HificModel.coded_bpp) must track the REAL
    coded length. The model-density estimate does not: where the learned
    prior underfits, -log2 p is unbounded while the 12-bit quantized CDF
    tables floor every in-range symbol at ~12 bits (zero-mass repair in
    pmf_to_quantized_cdf). On a trained hific-hi checkpoint the density
    estimate ran 2.0x the coded bytes (0.447 vs 0.228 bpp, all of it in
    hyperprior z channels) — the v9 ladder regulated to exactly half its
    targets because of it. A fresh random model underfits its data by
    construction, so the same separation is testable tiny."""
    cfg = _tiny_cfg()
    model = hific.HificModel(cfg)
    batch = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    image = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    x = jnp.asarray(image, jnp.float32)[None] / 255.0
    probe = float(
        model.apply(g_params, x, method=hific.HificModel.coded_bpp)
    )
    density = float(
        model.apply(g_params, x, jax.random.PRNGKey(2), training=False)[2]
    )
    coded = len(hific.compress(model, g_params, image)) * 8 / (64 * 64)
    # A random-init model is the WORST case for the clamp: many symbols
    # fall outside the tables entirely and get escape-coded (marker +
    # Elias gamma, i.e. MORE than the 12-bit floor), and at 64px the blob
    # framing is a visible fraction of the payload — so the bounds here
    # are loose. On the trained checkpoints the probe tracks the coded
    # bytes to ~2% (tools-level validation, see coded_bpp docstring).
    assert probe <= density + 1e-6
    assert 0.3 * coded < probe < 1.3 * coded, (probe, coded, density)
    # The probe must be the BETTER estimate of the coded rate.
    assert abs(probe - coded) <= abs(density - coded), (
        probe, density, coded,
    )


def test_rate_hinge_steers_toy_rate_to_target():
    """The two-lambda hinge (model.py:144, reference model.py rate
    targeting) must *steer* rate to target, not merely weight it: with a
    distortion pull whose gradient sits strictly between lambda_b and
    lambda_a, a fixed lambda_a collapses rate toward 0 and a fixed
    lambda_b lets it run away — only the hinge pins it at target_rate.

    Toy generator: bpp = softplus(r) with one trainable r; distortion =
    -c * bpp (constant gradient pull toward higher rate, c in
    (lambda_b, lambda_a)). Run the identical descent under all three
    lambda policies and check the equilibria."""
    import optax

    cfg = hific.get_config("hific-lo")  # target 0.14, lambdas 0.1 / 2^-4
    c = 0.5 * (cfg.lambda_a + cfg.lambda_b)
    assert cfg.lambda_b < c < cfg.lambda_a

    def make_loss(policy):
        def loss(r):
            bpp = jax.nn.softplus(r)
            if policy == "hinge":  # the exact expression from model.py:144
                lam = jnp.where(
                    bpp > cfg.target_rate, cfg.lambda_a, cfg.lambda_b
                )
            else:
                lam = cfg.lambda_a if policy == "a" else cfg.lambda_b
            return lam * bpp - c * bpp

        return loss

    def run(policy, steps=3000, lr=5e-3):
        tx = optax.adam(lr)
        grad = jax.jit(jax.grad(make_loss(policy)))
        r = jnp.asarray(1.5)  # start well above target (bpp ~1.7)
        opt = tx.init(r)
        for _ in range(steps):
            u, opt = tx.update(grad(r), opt, r)
            r = optax.apply_updates(r, u)
        return float(jax.nn.softplus(r))

    hinge_bpp = run("hinge")
    assert abs(hinge_bpp - cfg.target_rate) < 0.05, hinge_bpp
    assert run("a") < 0.02           # always-push-down: rate collapses
    assert run("b") > 1.7            # always-relax: rate runs away


def test_configs():
    for name, rate in (("hific-lo", 0.14), ("hific-mi", 0.3), ("hific-hi", 0.45)):
        assert hific.get_config(name).target_rate == rate


def test_dp_gan_step_matches_single_device():
    """The data-parallel joint G/D step over a 2-device mesh computes the
    identical update to the equivalent single-device math: mean of per-shard
    losses with the same per-device folded rngs, G and D grads pmean'd
    (BASELINE config #5). target_rate=0 pins the rate hinge to lambda_a on
    every shard and globally, so the folded dither rngs are the only
    DP-vs-single difference — which the reference below reproduces."""
    import optax
    from compression_tpu.parallel.data_parallel import make_mesh, shard_batch
    from compression_tpu.models.hific.lpips import LPIPS

    n = 2  # 2 shards keep the n-times-unrolled reference compile tractable
    cfg = hific.HificConfig(
        name="hific-test", target_rate=0.0, num_latents=8,
        num_hyperlatents=4, num_residual_blocks=1,
    )
    model = hific.HificModel(cfg)
    disc = hific.Discriminator()
    lpips = LPIPS()
    # 64x64 is the smallest input whose 16x-downsampled latent matches the
    # hyper stack's stride arithmetic (at 32x32 the 2x2 latent meets a 4x4
    # hyper-synthesis output).
    batch = jnp.asarray(
        np.random.RandomState(0).rand(n, 64, 64, 3), jnp.float32
    )
    lp = lpips.init(jax.random.PRNGKey(3), batch, batch)
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    _, y_hat0, _, _ = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    d_vars = disc.init(jax.random.PRNGKey(4), batch, y_hat0, update_stats=False)

    step, g_tx, d_tx = hific.make_train_steps(
        model, disc, lpips, lp, cfg, num_devices=n
    )
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_vars["params"])
    rng = jax.random.PRNGKey(5)
    mesh = make_mesh(n)
    dp_g, dp_d, _, _, metrics = step(
        g_params, d_vars, g_opt, d_opt, shard_batch(batch, mesh), rng
    )

    # --- single-device reference: same math without shard_map ---
    g_loss_fn, d_loss_fn = hific.make_loss_fns(model, disc, lpips, lp, cfg)
    rngs = [jax.random.fold_in(rng, d) for d in range(n)]

    def ref_g_loss(p):
        losses = [
            g_loss_fn(p, d_vars, batch[d : d + 1], rngs[d])[0]
            for d in range(n)
        ]
        return jnp.mean(jnp.stack(losses))

    ref_g_grads = jax.grad(ref_g_loss)(g_params)
    g_updates, _ = g_tx.update(ref_g_grads, g_opt, g_params)
    ref_g = optax.apply_updates(g_params, g_updates)

    d_params = d_vars["params"]
    d_state = {k: v for k, v in d_vars.items() if k != "params"}
    shard_aux = [
        g_loss_fn(g_params, d_vars, batch[d : d + 1], rngs[d])[1]
        for d in range(n)
    ]

    def ref_d_loss(dp):
        losses = [
            d_loss_fn(
                dp, d_state, batch[d : d + 1],
                shard_aux[d]["x_hat"], shard_aux[d]["y_hat"],
            )[0]
            for d in range(n)
        ]
        return jnp.mean(jnp.stack(losses))

    ref_d_grads = jax.grad(ref_d_loss)(d_params)
    d_updates, _ = d_tx.update(ref_d_grads, d_opt, d_params)
    ref_d_params = optax.apply_updates(d_params, d_updates)

    np.testing.assert_allclose(
        float(metrics["g_loss"]), float(ref_g_loss(g_params)), rtol=1e-6
    )

    # Updated-parameter comparison, gradient-aware: adam's first step is
    # ~lr*sign(grad), so where the gradient is solidly nonzero the DP and
    # reference updates must agree tightly; where it is ~0, float
    # reduction-order noise (shard_map pmean vs grad-of-mean are different
    # XLA programs) can flip the sign, bounded by the 2*lr step size.
    def assert_update_close(dp_tree, ref_tree, grad_tree, lr):
        for a, b, g in zip(
            jax.tree_util.tree_leaves(dp_tree),
            jax.tree_util.tree_leaves(ref_tree),
            jax.tree_util.tree_leaves(grad_tree),
        ):
            a, b, g = np.asarray(a), np.asarray(b), np.abs(np.asarray(g))
            stable = g > 1e-4 * (g.max() + 1e-30)
            np.testing.assert_allclose(
                a[stable], b[stable], rtol=1e-3, atol=2e-6
            )
            np.testing.assert_allclose(a[~stable], b[~stable], atol=2.5 * lr)

    assert_update_close(dp_g, ref_g, ref_g_grads, cfg.lr)
    assert_update_close(dp_d["params"], ref_d_params, ref_d_grads, cfg.disc_lr)
    # Every device's replica of the updated G params must be identical.
    checked = 0
    for leaf in jax.tree_util.tree_leaves(dp_g):
        shards = getattr(leaf, "addressable_shards", None)
        if not shards:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(np.asarray(s.data), ref)
            checked += 1
    assert checked > 0


def test_gan_warmup_gates_gan_term_and_disc_updates():
    """gan_warmup_steps (configs.py): before the warm-up boundary the GAN
    term leaves the G loss and the D update is zeroed; at the boundary
    both switch on. Round-4 motivation: at 192px patches the
    discriminator dominates from step 100 and reconstruction never
    starts (tools/diag_hific_192.py)."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(), gan_warmup_steps=5)
    model = hific.HificModel(cfg)
    disc = hific.Discriminator()
    from compression_tpu.models.hific.lpips import LPIPS

    lpips = LPIPS()
    batch = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    lp = lpips.init(jax.random.PRNGKey(3), batch, batch)
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    _, y_hat0, _, _ = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    d_vars = disc.init(jax.random.PRNGKey(4), batch, y_hat0, update_stats=False)
    step, g_tx, d_tx = hific.make_train_steps(model, disc, lpips, lp, cfg)
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_vars["params"])

    d_before = d_vars["params"]
    g1, d1, go1, do1, m_warm = step(
        g_params, d_vars, g_opt, d_opt, batch, jax.random.PRNGKey(5),
        jnp.int32(0),
    )
    assert float(m_warm["gan_on"]) == 0.0
    # D params unchanged during warm-up (its grads are gated to zero).
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(d_before),
        jax.tree_util.tree_leaves_with_path(d1["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # ... and so is its OPTIMIZER state: Adam's step count must not
    # advance during warm-up, or bias correction at warm-up end behaves
    # as if N steps already happened (damped early D updates vs the
    # fresh-optimizer semantics warm-up promises).
    for (_, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(d_opt),
        jax.tree_util.tree_leaves_with_path(do1),
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    _, d2, _, _, m_on = step(
        g1, d1, go1, do1, batch, jax.random.PRNGKey(6), jnp.int32(5)
    )
    assert float(m_on["gan_on"]) == 1.0
    changed = any(
        not np.array_equal(np.asarray(va), np.asarray(vb))
        for (_, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(d1["params"]),
            jax.tree_util.tree_leaves_with_path(d2["params"]),
        )
    )
    assert changed, "discriminator must update once the warm-up ends"

    # Legacy 6-arg call (dryrun/tests written before the gate) behaves as
    # past-warm-up.
    _, _, _, _, m_legacy = step(
        g1, d1, go1, do1, batch, jax.random.PRNGKey(7)
    )
    assert float(m_legacy["gan_on"]) == 1.0


def test_probe_bpp_overrides_hinge_statistic():
    """Probe-calibrated controller (configs.py rate_probe_glob): a
    nonnegative probe_bpp replaces the patch statistic in the hinge
    comparison (model.py hinge_stat); negative keeps the patch hinge.
    Motivation: every config trained at 128px evaluated to ~0.5 bpp on
    768x512 images regardless of target — the controller must regulate
    the full-resolution statistic, not the patch one."""
    cfg = _tiny_cfg()
    model = hific.HificModel(cfg)
    disc = hific.Discriminator()
    from compression_tpu.models.hific.lpips import LPIPS

    lpips = LPIPS()
    batch = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    lp = lpips.init(jax.random.PRNGKey(3), batch, batch)
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    _, y_hat0, _, _ = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    d_vars = disc.init(jax.random.PRNGKey(4), batch, y_hat0, update_stats=False)
    step, g_tx, d_tx = hific.make_train_steps(model, disc, lpips, lp, cfg)
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_vars["params"])

    def run(probe):
        _, _, _, _, m = step(
            g_params, d_vars, g_opt, d_opt, batch, jax.random.PRNGKey(5),
            jnp.int32(10), probe_bpp=jnp.float32(probe),
        )
        return m

    m_hi = run(10.0)  # far above target -> push-down arm on
    assert float(m_hi["hinge_stat"]) == 10.0
    assert float(m_hi["hinge_on"]) == 1.0
    m_lo = run(0.001)  # below target -> relax arm
    assert float(m_lo["hinge_stat"]) == jnp.float32(0.001)
    assert float(m_lo["hinge_on"]) == 0.0
    m_off = run(-1.0)  # disabled -> patch statistic passes through
    assert float(m_off["hinge_stat"]) == float(m_off["hinge_bpp"])
    # The untouched-by-the-hinge metrics agree across probe values (the
    # probe only selects the lambda arm; rate/distortion are identical).
    np.testing.assert_allclose(
        float(m_hi["bpp"]), float(m_lo["bpp"]), rtol=1e-6
    )


def test_rate_probe_glob_train_integration(tmp_path):
    """hific.train with rate_probe_glob measures the probe rate and
    threads it into the step (train.py probe_fn): smoke the full path on
    CPU with a tiny model + 2-step run."""
    import dataclasses

    from compression_tpu.models import common
    from compression_tpu.util import image as image_util

    rng = np.random.RandomState(0)
    for i in range(2):
        image_util.write_png(
            str(tmp_path / f"p{i}.png"),
            rng.randint(0, 255, (128, 128, 3)).astype(np.uint8),
        )
    cfg = dataclasses.replace(
        _tiny_cfg(),
        rate_probe_glob=str(tmp_path / "*.png"),
        rate_probe_every=1,
    )
    tc = common.TrainConfig(
        train_glob=None, steps=2, batch_size=1, patch_size=64, log_every=1,
        seed=0,
    )
    model, g_params, d_vars = hific.train(cfg, tc)
    assert g_params is not None


def test_hinge_softness_interpolates_lambda():
    """hinge_softness (round-5, configs.py): the log-proportional
    controller hits lambda_a at rate >= target*2^s, lambda_b at
    rate <= target/2^s, and the geometric mean exactly at the target —
    same endpoints as the bang-bang, smooth interior (the coded-rate
    probe is too cliffy for a 128x hard switch)."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(), hinge_softness=1.0)
    model = hific.HificModel(cfg)
    disc = hific.Discriminator()
    from compression_tpu.models.hific.lpips import LPIPS

    lpips = LPIPS()
    batch = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    lp = lpips.init(jax.random.PRNGKey(3), batch, batch)
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    _, y_hat0, _, _ = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    d_vars = disc.init(
        jax.random.PRNGKey(4), batch, y_hat0, update_stats=False
    )
    g_loss_fn, _ = hific.make_loss_fns(model, disc, lpips, lp, cfg)

    def lam_at(rate):
        _, aux = g_loss_fn(
            g_params, d_vars, batch, jax.random.PRNGKey(5),
            probe_bpp=rate,
        )
        return float(aux["lam"])

    t = cfg.target_rate
    np.testing.assert_allclose(lam_at(4.0 * t), cfg.lambda_a, rtol=1e-6)
    np.testing.assert_allclose(lam_at(t / 4.0), cfg.lambda_b, rtol=1e-6)
    np.testing.assert_allclose(
        lam_at(t), float(np.sqrt(cfg.lambda_a * cfg.lambda_b)), rtol=1e-5
    )
    # Monotone between the rails.
    assert lam_at(t / 4) < lam_at(t / 1.5) < lam_at(t) < lam_at(1.5 * t) \
        < lam_at(4 * t)


def test_train_warm_start_resumes_generator():
    """hific.train(params=...) (round-5): the generator side starts from
    the given tree — the fine-tune-at-larger-patch recipe that gets past
    the from-scratch 192px GAN collapse (VERDICT r4 task 1). The warm
    tree must be used verbatim (not re-initialized)."""
    from compression_tpu.models import common

    cfg = _tiny_cfg()
    tc = common.TrainConfig(
        train_glob=None, steps=1, batch_size=1, patch_size=64, log_every=1,
        seed=0,
    )
    # A recognizable warm tree: train one step, then scale a leaf.
    _, warm, _ = hific.train(cfg, tc)
    marker = jax.tree_util.tree_leaves(warm)[0]
    _, g2, _ = hific.train(cfg, tc, params=warm)
    # One step of Adam moves weights by at most ~lr per coordinate, so
    # starting from `warm` the result stays within lr*steps of it —
    # whereas a fresh init would differ by the init scale.
    d0 = float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(g2)[0] - marker)))
    assert d0 <= 2 * cfg.lr * tc.steps + 1e-8, d0


def test_lam_override_bypasses_hinge_and_k_mse_scale_scales_loss():
    """Integral-controller plumbing (round-5, configs.py hinge_integral):
    a nonnegative lam_override IS the rate lambda regardless of the probe
    statistic, and k_mse_scale multiplies exactly the MSE term."""
    import dataclasses

    cfg = _tiny_cfg()
    model = hific.HificModel(cfg)
    disc = hific.Discriminator()
    from compression_tpu.models.hific.lpips import LPIPS

    lpips = LPIPS()
    batch = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    lp = lpips.init(jax.random.PRNGKey(3), batch, batch)
    g_params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), training=True
    )
    _, y_hat0, _, _ = model.apply(
        g_params, batch, jax.random.PRNGKey(2), training=True
    )
    d_vars = disc.init(
        jax.random.PRNGKey(4), batch, y_hat0, update_stats=False
    )
    g_loss_fn, _ = hific.make_loss_fns(model, disc, lpips, lp, cfg)

    def run(**kw):
        return g_loss_fn(
            g_params, d_vars, batch, jax.random.PRNGKey(5), **kw
        )

    # Override wins over any probe statistic (high or low rate).
    for probe in (0.01, 100.0):
        _, aux = run(probe_bpp=probe, lam_override=0.375)
        np.testing.assert_allclose(float(aux["lam"]), 0.375, rtol=1e-6)
    # Negative override falls back to the configured hinge law.
    _, aux = run(probe_bpp=100.0, lam_override=-1.0)
    np.testing.assert_allclose(float(aux["lam"]), cfg.lambda_a, rtol=1e-6)

    # k_mse_scale: same params, scaled config -> loss differs by exactly
    # (scale - 1) * k_mse * mse.
    cfg4 = dataclasses.replace(cfg, k_mse_scale=4.0)
    g_loss_fn4, _ = hific.make_loss_fns(model, disc, lpips, lp, cfg4)
    l1, aux1 = run(probe_bpp=0.01, lam_override=0.375)
    l4, aux4 = g_loss_fn4(
        g_params, d_vars, batch, jax.random.PRNGKey(5),
        probe_bpp=0.01, lam_override=0.375,
    )
    np.testing.assert_allclose(
        float(l4 - l1), 3.0 * cfg.k_mse * float(aux1["mse"]), rtol=1e-5
    )


def test_hinge_integral_train_integration(tmp_path):
    """hinge_integral (round-5): the host integrator seeds lambda at the
    geometric midpoint and multiplies by (ema/target)^ki at every probe
    refresh — with the probe rate far above target, lam must RISE
    monotonically toward lambda_a within a few steps (the proportional
    law's droop is the diagnosed v7 failure; see configs.py)."""
    import dataclasses

    from compression_tpu.models import common
    from compression_tpu.util import image as image_util

    rng = np.random.RandomState(0)
    image_util.write_png(
        str(tmp_path / "p0.png"),
        rng.randint(0, 255, (128, 128, 3)).astype(np.uint8),
    )
    cfg = dataclasses.replace(
        _tiny_cfg(),
        rate_probe_glob=str(tmp_path / "*.png"),
        rate_probe_every=1,
        probe_ema=0.5,
        hinge_integral=0.5,
        # A tiny random model on noise codes far above this target.
        target_rate=0.01,
    )
    tc = common.TrainConfig(
        train_glob=None, steps=3, batch_size=1, patch_size=64, log_every=1,
        seed=0, checkpoint_dir=str(tmp_path), checkpoint_name="t.msgpack",
    )
    model, g_params, d_vars = hific.train(cfg, tc)
    import csv as _csv

    with open(str(tmp_path / "t.msgpack.metrics.csv")) as f:
        rows = list(_csv.DictReader(f))
    lams = [float(r["lam"]) for r in rows]
    mid = float(np.sqrt(cfg.lambda_a * cfg.lambda_b))
    assert lams[0] > mid, (lams, mid)       # first refresh already pushed up
    assert lams == sorted(lams), lams       # monotone rise while over target
    # And hinge_integral without a probe is rejected.
    import pytest as _pytest

    bad = dataclasses.replace(cfg, rate_probe_glob="")
    with _pytest.raises(ValueError, match="rate_probe_glob"):
        hific.train(bad, tc)
