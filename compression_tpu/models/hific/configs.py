"""HiFiC named configurations (reference: models/hific/configs.py:30-80).

Three operating points — hific-lo / -mi / -hi — distinguished only by the
target rate and the rate-hinge lambdas. Loss weights follow the paper
(Mentzer et al. 2020, Table 4): MSE (on 0-255 scale) * 0.075 * 2^-5,
LPIPS weight 1.0, GAN weight 0.15.
"""

from __future__ import annotations

import dataclasses

__all__ = ["HificConfig", "get_config", "CONFIGS"]


@dataclasses.dataclass(frozen=True)
class HificConfig:
    name: str
    target_rate: float            # bpp target for the rate hinge
    # Rate-hinge arms (reference model.py rate targeting). The push-down
    # arm must dominate the distortion pull whenever bpp > target, or the
    # hinge never reaches its operating point: normalizing this loss by
    # k_mse puts lambda_a's rate coefficient in bmshj2018-lambda units as
    # lambda_a / (k_mse * 255^2-scale) — the old 0.1 was equivalent to a
    # high-quality ~1 bpp operating point, which is why early checkpoints
    # sat at 2.8 bpp with the hinge "on".
    #
    # Round-3 evidence set the current value: with lambda_a=1.0 ALL THREE
    # configs converged to ~0.25-0.28 bpp regardless of target — the
    # signature of a saturated hinge. lambda_a's own equilibrium rate on
    # this data (~0.25 bpp) sat ABOVE hific-lo's 0.14 target, so for lo
    # the push-down arm was permanently on and bpp settled at lambda_a's
    # equilibrium, not the target; mi/hi then landed in the same band via
    # the patch-vs-eval statistics gap. A bang-bang controller only
    # regulates when each arm's equilibrium brackets every target:
    # lambda_a=8.0 puts the push-down equilibrium well below 0.14 (rate
    # pressure of a ~0.03-bpp codec in bmshj-lambda units), letting the
    # duty cycle — logged as ``hinge_on`` in training metrics — do the
    # regulating for all three operating points.
    lambda_a: float = 8.0         # rate weight when bpp > target (push down)
    lambda_b: float = 2.0 ** -4   # rate weight when bpp <= target (relax)
    # The hinge compares the INTERIOR latent rate against target_rate, not
    # the whole-patch rate. Round-4 diagnosis (tools/diag_hific_rate.py):
    # per-latent bits form a ring profile — latents within ~3 positions of
    # the patch edge cost ~10-30 bits (conv edge-padding flattens their
    # support) while interior latents cost ~140-180. On a 128px training
    # patch (8x8 latent grid) nearly EVERY latent is in the cheap boundary
    # regime, so the whole-patch bpp the hinge regulated ran ~4x below the
    # interior rate that dominates a 768x512 eval image — all three
    # operating points then landed at the same ~0.5 eval bpp (rate-
    # inverted, round-3/4 results). Hinging on latents >= this many
    # positions from the edge regulates the statistic that actually
    # transfers to full-size images; eval bpp then approaches the target
    # from below as the boundary fraction shrinks.
    #
    # Minimum patch size for a stable interior statistic: the interior
    # grid is (H/16 - 2*ring)^2 latents, so ring=3 on a 128px patch (8x8
    # grid) leaves only a 2x2 block — a very high-variance signal for the
    # bang-bang controller. Prefer patches >= 192px (ring=3 -> 6x6
    # interior) when the interior hinge is load-bearing, or set
    # rate_probe_glob, which replaces this heuristic entirely with the
    # measured full-resolution rate.
    hinge_boundary_ring: int = 3
    k_mse: float = 0.075 * 2.0 ** -5
    k_lpips: float = 1.0
    k_gan: float = 0.15
    # Generator warm-up: for the first N steps the GAN term is removed
    # from the generator loss AND the discriminator's updates are gated
    # off (its spectral-norm state still tracks). Round-4 diagnosis
    # (tools/diag_hific_192.py + diag_grad_miscompile.py): at 192px
    # patches the discriminator is dominant from step 100 (d_loss 0.25
    # vs 0.56 at 128px) and reconstruction never starts (mse frozen at
    # dataset variance) — gradients are healthy, the equilibrium is not.
    # Warming the generator up on mse+lpips+rate first gives the GAN a
    # non-degenerate generator to balance against. 0 = reference
    # behavior (GAN from step 1, as in models/hific/train.py upstream).
    gan_warmup_steps: int = 0
    # Probe-calibrated rate controller: when set, the hinge compares the
    # measured bpp of the FULL-RESOLUTION images matching this glob
    # (re-measured from the live params every rate_probe_every steps)
    # against target_rate, instead of the training-patch bpp. This closes
    # the patch-vs-eval rate-statistics gap by construction — the
    # controller regulates the statistic that is actually reported — and
    # subsumes the interior-ring heuristic above. The probe images must
    # come from the TRAINING distribution (e.g. full-size training
    # images, or extra draws of the same generator at eval resolution);
    # pointing it at held-out eval images would leak the test set into
    # training. "" = reference behavior (hinge on the patch statistic).
    rate_probe_glob: str = ""
    rate_probe_every: int = 100
    # Controller smoothing (round-5). The CODED-rate probe is a cliffy
    # statistic: under the pure two-lambda bang-bang (ratio lambda_a /
    # lambda_b = 128x) the measured rate oscillated 0.06 <-> 0.52 bpp
    # between probe refreshes (hific-lo-v6 log). Two standard loop fixes,
    # both 0 = reference bang-bang behavior:
    #  - hinge_softness s > 0: lambda becomes log-proportional in the rate
    #    error — lambda = lambda_b at rate <= target/2^s, lambda_a at
    #    rate >= target*2^s, geometric interpolation between (a smooth
    #    actuator with a finite equilibrium at the target instead of two
    #    saturating arms).
    #  - probe_ema in [0,1): exponential smoothing of the probe sensor
    #    (ADVICE r4: smooth the hinge statistic before the comparison).
    hinge_softness: float = 0.0
    probe_ema: float = 0.0
    # Integral rate controller (round-5). The log-proportional law above
    # has steady-state droop by construction: its fixed point is where
    # lambda(rate) meets the codec's own rate-vs-lambda curve, not the
    # target (measured: hific-hi-v7 settled at eval 0.78-0.84 bpp for
    # target 0.45 with lam oscillating 5-6.5 — self-consistent and
    # wrong). hinge_integral = ki > 0 switches the controller to a
    # host-side log-space integrator: at every probe refresh,
    # lambda *= (ema_rate / target)^ki, clipped to [lambda_b, lambda_a].
    # At equilibrium the multiplier is 1 exactly at rate == target — no
    # droop. ki is the per-refresh gain (0.3-0.7 stable with
    # probe_ema 0.6 at 25-step cadence). 0 = proportional/bang-bang law.
    hinge_integral: float = 0.0
    # LPIPS-absent rebalancing. The paper's loss balance assumes a REAL
    # VGG-LPIPS term (weight 1.0 — typically the largest loss share);
    # with the sandbox's random-init VGG the perceptual term is inert
    # (~0.0015 of the loss), leaving reconstruction anchored by k_mse
    # alone against the GAN term — measured v7 outcome: mse ~250-320
    # (24.5 dB) where healthy HiFiC sits a few dB under the MSE codecs
    # (>= 28 dB here). Scaling k_mse restores the faithfulness pressure
    # the missing LPIPS was supplying. 1.0 = paper weights.
    k_mse_scale: float = 1.0
    num_latents: int = 220
    num_hyperlatents: int = 320
    num_residual_blocks: int = 9
    lr: float = 1e-4
    disc_lr: float = 1e-4


CONFIGS = {
    "hific-lo": HificConfig(name="hific-lo", target_rate=0.14),
    "hific-mi": HificConfig(name="hific-mi", target_rate=0.30),
    "hific-hi": HificConfig(name="hific-hi", target_rate=0.45),
}


def get_config(name: str) -> HificConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown HiFiC config {name!r}; have {sorted(CONFIGS)}")
    return CONFIGS[name]
