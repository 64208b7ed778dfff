"""tfci-compatible CLI: compress / decompress / models / dump / train.

Re-implementation of the reference CLI surface (reference:
models/tfci.py:1-330). Differences forced by the environment: the reference
fetches frozen metagraphs from GCS; this framework resolves model names
through a local registry + msgpack checkpoints (zero-egress sandbox). The
.tfci container format is byte-compatible (PackedTensors), including the
self-describing model name — `decompress` needs no model argument.

Usage:
  python -m compression_tpu.cli.tfci models
  python -m compression_tpu.cli.tfci compress bmshj2018-hyperprior-mse-6 in.png [out.tfci]
  python -m compression_tpu.cli.tfci decompress out.tfci [out.png]
  python -m compression_tpu.cli.tfci dump out.tfci
  python -m compression_tpu.cli.tfci train bls2017 --steps 1000 --glob 'data/*.png'
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from compression_tpu.cli import registry
from compression_tpu.util import PackedTensors
from compression_tpu.util import image as image_util


def _load_model(name: str, allow_random: bool = False):
    import jax
    import jax.numpy as jnp

    entry, ckpt = registry.resolve(name)
    if ckpt is None and not allow_random:
        # Fail fast, before the (expensive) model init/compile.
        raise FileNotFoundError(
            f"no checkpoint for {name!r} in {registry.model_dir()} — train "
            f"one (tfci train {name}) or pass --allow-random for testing"
        )
    model = entry.make_model()
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    # Init on host CPU: the values are immediately replaced by the loaded
    # checkpoint, so there is no reason to pay an accelerator compile of
    # the init program (minutes on a tunneled TPU).
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        init_ctx = jax.default_device(cpu)
        x0 = jax.device_put(x0, cpu)
    except RuntimeError:
        import contextlib

        init_ctx = contextlib.nullcontext()
    with init_ctx:
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )
    # Un-commit from the CPU so the codec jits stay on the accelerator.
    params = jax.device_put(params, jax.devices()[0])
    if ckpt is not None:
        from compression_tpu.models.common import load_checkpoint
        from compression_tpu.models.codec_cache import register_table_cache

        params, _ = load_checkpoint(ckpt, params)
        # Persist range-coder tables next to the checkpoint (keyed by its
        # mtime/size so retraining invalidates them). Bound to THIS params
        # pytree — a process that loads several models must not share one
        # process-global table path.
        st = os.stat(ckpt)
        register_table_cache(
            params, f"{ckpt}.{st.st_mtime_ns}.{st.st_size}.tables.npz"
        )
    return entry, model, params


def cmd_models(args) -> int:
    for name in registry.list_models():
        entry = registry.REGISTRY[name](0.01)
        print(f"{name:32s} {entry.description}")
    return 0


def _spatial_codec(entry, model, params, n: int):
    """Builds the family's giant-image SpatialCodec over an n-device mesh
    (transforms H-sharded; see models/<family>.SpatialCodec)."""
    import importlib

    import jax as _jax

    from compression_tpu.parallel.data_parallel import make_mesh

    if entry.family not in ("bls2017", "bmshj2018", "mbt2018", "ms2020",
                            "hific"):
        raise SystemExit(
            f"--spatial needs one of the codec families bls2017/bmshj2018/"
            f"mbt2018/ms2020/hific; got {entry.family!r}"
        )
    ndev = len(_jax.devices())
    if not 1 <= n <= ndev:
        raise SystemExit(
            f"--spatial {n}: this process sees {ndev} device(s)"
        )
    mod = importlib.import_module(
        "compression_tpu.models.hific.model" if entry.family == "hific"
        else f"compression_tpu.models.{entry.family}"
    )
    return mod.SpatialCodec(model, params, make_mesh(n))



def cmd_compress(args) -> int:
    name = args.model
    if getattr(args, "rd_parameter", None) is not None:
        # Reference CLI parity (models/tfci.py --rd_parameter): a runtime
        # rate point for variable-rate models — equivalent to the quality
        # suffix, e.g. `compress b2018-gdn-128 --rd_parameter 2` ==
        # `compress b2018-gdn-128-2`.
        from compression_tpu.cli.registry import VARIABLE_RATE, _split_name

        base, quality = _split_name(name)
        if base not in VARIABLE_RATE:
            raise SystemExit(
                f"--rd_parameter only applies to variable-rate models "
                f"({', '.join(sorted(VARIABLE_RATE))}); {name!r} selects "
                f"its rate via per-quality checkpoints"
            )
        if quality is not None and quality != int(args.rd_parameter):
            raise SystemExit(
                f"conflicting rate points: name says {quality}, "
                f"--rd_parameter says {args.rd_parameter}"
            )
        name = f"{base}-{int(args.rd_parameter)}"
    entry, model, params = _load_model(name, args.allow_random)
    image = image_util.read_png(args.input)
    if getattr(args, "device_coder", False):
        # On-TPU rANS entropy coding (codec/rans.py): the y stream is
        # coded on the device; decompress auto-detects the format.
        if entry.family not in ("bmshj2018", "ms2020", "mbt2018", "hific"):
            raise SystemExit(
                f"--device-coder needs a hyperprior family (bmshj2018/"
                f"mbt2018/ms2020/hific); {name!r} is {entry.family}"
            )
        data = entry.compress(model, params, image, coder="device")
    elif getattr(args, "spatial", None):
        # Giant-image mode: transforms H-sharded over a device mesh.
        data = _spatial_codec(entry, model, params, args.spatial).compress(
            image
        )
    else:
        data = entry.compress(model, params, image)
    out = args.output or args.input + ".tfci"
    with open(out, "wb") as f:
        f.write(data)
    bpp = len(data) * 8 / (image.shape[0] * image.shape[1])
    print(f"{out}: {len(data)} bytes, {bpp:.4f} bpp")
    return 0


def cmd_decompress(args) -> int:
    with open(args.input, "rb") as f:
        data = f.read()
    name = PackedTensors(data).model
    entry, model, params = _load_model(name, args.allow_random)
    if getattr(args, "jit", False):
        # The in-jit serving decoder: the whole decode is ONE compiled
        # program with two pure_callback range-decodes (SURVEY §2.1 design
        # intent; byte-exact vs the staged path, tests/test_jit_decode.py).
        if entry.family != "bmshj2018":
            raise SystemExit(
                f"--jit decode is implemented for the bmshj2018 family; "
                f"{name!r} is {entry.family}"
            )
        from compression_tpu.models import bmshj2018 as _bmshj

        codec = _bmshj.make_codec(model, params)
        image = codec.decompress_batch_jit([data])[0]
    elif getattr(args, "spatial", None):
        image = _spatial_codec(
            entry, model, params, args.spatial
        ).decompress(data)
    else:
        image = entry.decompress(model, params, data)
    out = args.output or os.path.splitext(args.input)[0] + ".png"
    image_util.write_png(out, image)
    print(f"{out}: {image.shape[1]}x{image.shape[0]} (model {name})")
    return 0


def cmd_dump(args) -> int:
    with open(args.input, "rb") as f:
        packed = PackedTensors(f.read())
    print(f"model: {packed.model}")
    for key, kind, count, size in packed.describe():
        if key == "MD":
            continue
        print(f"tensor {key}: {kind:6s} x{count:<8d} {size} bytes")
    if args.output:
        # Reference parity (models/tfci.py dump ≈250): extract the packed
        # tensors to a file, not just describe them. One .npz holds every
        # tensor: int64/float features as 1-D arrays under their positional
        # key; bytes features as uint8 arrays (key "<i>" for a single
        # string, "<i>.<j>" per element otherwise) so the raw bitstreams
        # are recoverable with .tobytes().
        arrays = {"model": np.array(packed.model)}
        for key, kind, count, _size in packed.describe():
            if key == "MD":
                continue
            if kind == "bytes":
                vals = packed.unpack_one(int(key), object)
                if count == 1:
                    arrays[key] = np.frombuffer(vals[0], np.uint8)
                else:
                    for j, v in enumerate(vals):
                        arrays[f"{key}.{j}"] = np.frombuffer(v, np.uint8)
            else:
                arrays[key] = packed.unpack_one(
                    int(key), np.int64 if kind == "int64" else np.float32
                )
        np.savez(args.output, **arrays)
        print(f"wrote {args.output} ({len(arrays)} arrays)")
    return 0


def cmd_train(args) -> int:
    from compression_tpu.models.common import TrainConfig, save_checkpoint

    entry, ckpt = registry.resolve(args.model)
    family = entry.family
    import importlib

    # The periodic training checkpoint must share its stem with the eval
    # checkpoint (registry.checkpoint_path): aliases and variable-rate
    # quality suffixes canonicalize there, and naming the .train.msgpack
    # from the raw CLI name would let `train b2018` and `train
    # b2018-gdn-128` silently resume different training states while
    # eval reads a third file (and tools/promote_train_ckpt.py derives
    # its source from the canonical stem).
    stem = os.path.splitext(
        os.path.basename(registry.checkpoint_path(args.model))
    )[0]
    tc = TrainConfig(
        train_glob=args.glob,
        batch_size=args.batch_size,
        patch_size=args.patch_size,
        steps=args.steps,
        checkpoint_dir=registry.model_dir(),
        checkpoint_name=f"{stem}.train.msgpack",
        checkpoint_every=args.checkpoint_every,
        num_devices=args.num_devices,
        learning_rate=args.lr,
        lr_schedule=args.lr_schedule,
        lr_final_scale=args.lr_final_scale,
    )
    # --init-from: warm-start from another trained model of the SAME family
    # (e.g. fine-tune -msssim variants from their -mse twins — training
    # msssim from scratch converges to a luminance-drifted solution, see
    # tools/diag_ms2020_msssim.py; the reference's practice of separate
    # -mse/-msssim zoo checkpoints is reproduced by fine-tuning).
    warm = None
    if getattr(args, "init_from", None):
        src_entry, src_ckpt = registry.resolve(args.init_from)
        if src_entry.family != family:
            raise SystemExit(
                f"--init-from {args.init_from!r} is family "
                f"{src_entry.family}, target is {family} — architectures "
                f"must match to transfer parameters"
            )
        if src_ckpt is None:
            raise SystemExit(
                f"--init-from {args.init_from!r}: no checkpoint in "
                f"{registry.model_dir()}"
            )
        # Same family is necessary but not sufficient: qualities may differ
        # in ARCHITECTURE fields (e.g. num_filters), which would otherwise
        # surface as an opaque flax/optax shape error deep in training.
        # Compare every config field that is not a training/rate knob.
        _non_arch = {
            "lmbda", "distortion", "model_name", "quality", "name",
            "target_rate", "lambda_a", "lambda_b", "gan_warmup_steps",
            "rate_probe_glob", "rate_probe_every", "lr", "disc_lr",
            "hinge_boundary_ring", "hinge_softness", "probe_ema",
            "hinge_integral", "k_mse_scale",
        }
        src_cfg, dst_cfg = src_entry.config, entry.config
        if src_cfg is not None and dst_cfg is not None:
            import dataclasses as _dc

            mismatches = [
                f"{f.name}: {getattr(src_cfg, f.name)!r} != "
                f"{getattr(dst_cfg, f.name)!r}"
                for f in _dc.fields(type(dst_cfg))
                if f.name not in _non_arch
                and hasattr(src_cfg, f.name)
                and getattr(src_cfg, f.name) != getattr(dst_cfg, f.name)
            ]
            if mismatches:
                raise SystemExit(
                    f"--init-from {args.init_from!r}: architecture differs "
                    f"from {args.model!r} — " + "; ".join(mismatches)
                )
        _, _, warm = _load_model(args.init_from)
        print(f"warm-start from {args.init_from} ({src_ckpt})")
    if family == "hific":
        from compression_tpu.models import hific

        if args.lmbda is not None:
            raise SystemExit(
                "--lmbda does not apply to HiFiC (it uses target_rate + "
                "loss weights from its named config; edit "
                "models/hific/configs.py or pick hific-lo/mi/hi)"
            )
        import dataclasses as _dc

        hcfg = hific.get_config(args.model)
        if getattr(args, "gan_warmup", 0):
            hcfg = _dc.replace(hcfg, gan_warmup_steps=args.gan_warmup)
        if getattr(args, "rate_probe_glob", None):
            hcfg = _dc.replace(
                hcfg,
                rate_probe_glob=args.rate_probe_glob,
                rate_probe_every=args.rate_probe_every,
            )
        if getattr(args, "hinge_softness", 0.0):
            hcfg = _dc.replace(hcfg, hinge_softness=args.hinge_softness)
        if getattr(args, "probe_ema", 0.0):
            hcfg = _dc.replace(hcfg, probe_ema=args.probe_ema)
        if getattr(args, "hinge_integral", 0.0):
            if not hcfg.rate_probe_glob:
                raise SystemExit(
                    "--hinge-integral requires --rate-probe-glob (the "
                    "integrator consumes the probe's measured rate)"
                )
            hcfg = _dc.replace(hcfg, hinge_integral=args.hinge_integral)
        if getattr(args, "k_mse_scale", 1.0) != 1.0:
            hcfg = _dc.replace(hcfg, k_mse_scale=args.k_mse_scale)
        # --init-from warm-starts the GENERATOR side only (the saved
        # checkpoint is g_params); the discriminator restarts fresh —
        # recommend pairing with --gan-warmup so G settles at the new
        # patch statistics before the new D's gradients reach it.
        if warm is not None and not getattr(args, "gan_warmup", 0):
            print(
                "note: --init-from with a fresh discriminator and no "
                "--gan-warmup; consider --gan-warmup to let G settle first"
            )
        model, params, _ = hific.train(hcfg, tc, params=warm)
    else:
        mod = importlib.import_module(f"compression_tpu.models.{family}")
        # Use the registry's config (keeps quality lambdas and the
        # TPC_TINY_MODELS override consistent with the load path), with
        # the CLI lambda taking precedence.
        import dataclasses as _dc

        cfg = entry.config
        if args.lmbda is not None:
            if not any(f.name == "lmbda" for f in _dc.fields(cfg)):
                raise SystemExit(
                    f"--lmbda does not apply to {family} (variable-rate: "
                    f"its rate points come from the config's lambdas "
                    f"ladder; pick a quality at compress time instead)"
                )
            cfg = _dc.replace(cfg, lmbda=args.lmbda)
        model, params = mod.train(cfg, tc, params=warm)
    # Variable-rate families save under their base name (one checkpoint
    # serves all rate points) — checkpoint_path knows.
    path = registry.checkpoint_path(args.model)
    save_checkpoint(path, params, tc.steps)
    print(f"saved {path}")
    return 0


def cmd_eval(args) -> int:
    """R-D evaluation over an image glob: per-image bpp / PSNR / MS-SSIM +
    means (the role of the reference's results/ tables and eval scripts)."""
    import glob as globlib

    import jax.numpy as jnp

    entry, model, params = _load_model(args.model, args.allow_random)
    paths = sorted(globlib.glob(args.glob))
    if not paths:
        raise FileNotFoundError(f"no images match {args.glob!r}")
    # Metric choice is made once for the whole set: MS-SSIM needs >= 176px
    # at the smallest dim; mixing single-scale SSIM rows into an MS-SSIM
    # column (and its mean) would silently blend incompatible metrics.
    sizes = [image_util.read_png(p).shape[:2] for p in paths]
    use_ms = all(min(h, w) >= 176 for h, w in sizes)
    metric_name = "msssim" if use_ms else "ssim"
    if not use_ms:
        print(
            "note: images below 176px present — reporting single-scale "
            "SSIM for the whole set instead of MS-SSIM"
        )
    lpips_fn = None
    if getattr(args, "lpips", False):
        # Perceptual column (the HiFiC eval metric, reference
        # models/hific/evaluate.py). Honest labeling: without converted
        # VGG/LPIPS weights the fallback random-VGG features are a
        # smoke-grade perceptual proxy — make_lpips warns loudly.
        import jax as _jax

        from compression_tpu.models.hific.lpips import make_lpips

        lp_model, lp_params = make_lpips(64)
        _lp = _jax.jit(
            lambda a, b: lp_model.apply(lp_params, a[None], b[None])[0]
        )
        lpips_fn = lambda a, b: float(_lp(a / 255.0, b / 255.0))  # noqa: E731
    # Rate-targeted models (HiFiC): print each image's bpp against the
    # config's target so rate-controller tracking is visible at eval time,
    # not discovered later in a results table (VERDICT r4 task 6).
    target_rate = None
    if entry.family == "hific":
        from compression_tpu.models import hific as _hific

        target_rate = _hific.get_config(
            registry._split_name(args.model)[0]
        ).target_rate
    rows = []
    for path in paths:
        image = image_util.read_png(path)
        data = entry.compress(model, params, image)
        recon = entry.decompress(model, params, data)
        bpp = len(data) * 8 / (image.shape[0] * image.shape[1])
        psnr = float(
            image_util.psnr(
                image.astype(np.float32), recon.astype(np.float32)
            )
        )
        a = jnp.asarray(image, jnp.float32)
        b = jnp.asarray(recon, jnp.float32)
        ms = float(image_util.msssim(a, b) if use_ms else image_util.ssim(a, b))
        row = [os.path.basename(path), bpp, psnr, ms]
        extra = ""
        if lpips_fn is not None:
            row.append(lpips_fn(a, b))
            extra = f" lpips={row[-1]:.4f}"
        rows.append(tuple(row))
        tgt = (
            f" (target {target_rate:.2f}, x{bpp / target_rate:.2f})"
            if target_rate else ""
        )
        print(
            f"{rows[-1][0]:24s} bpp={bpp:.4f}{tgt} psnr={psnr:.2f} "
            f"{metric_name}={ms:.4f}" + extra
        )
    mean = np.mean(np.array([r[1:] for r in rows], np.float64), axis=0)
    extra = f" lpips={mean[3]:.4f}" if lpips_fn is not None else ""
    tgt = (
        f" (target {target_rate:.2f}, x{mean[0] / target_rate:.2f})"
        if target_rate else ""
    )
    print(
        f"{'MEAN':24s} bpp={mean[0]:.4f}{tgt} psnr={mean[1]:.2f} "
        f"{metric_name}={mean[2]:.4f}" + extra
    )
    if args.csv:
        lp_col = ",lpips" if lpips_fn is not None else ""
        with open(args.csv, "w") as f:
            f.write(f"image,bpp,psnr,{metric_name}{lp_col}\n")
            for row in rows:
                f.write(
                    row[0] + "," + ",".join(f"{v:.6f}" for v in row[1:])
                    + "\n"
                )
            f.write(
                "mean," + ",".join(f"{v:.6f}" for v in mean) + "\n"
            )
        print(f"wrote {args.csv}")
    return 0


def main(argv=None) -> int:
    if os.environ.get("JAX_PLATFORMS"):
        # The axon sitecustomize force-registers the TPU plugin and
        # overrides JAX_PLATFORMS; honor an explicit request (e.g. cpu for
        # CI) by re-asserting it through the config API before any backend
        # initializes (same as __graft_entry__).
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="tfci", description=__doc__)
    p.add_argument(
        "--strict-f32", action="store_true",
        default=os.environ.get("TPC_STRICT_F32") == "1",
        help="float32-strict transforms (no bf16 matmul/conv inputs): the "
        "bit-exactness mode for cross-backend bitstream comparison "
        "(SURVEY.md §7 hard part 1 — round(y - offset) near .5 boundaries "
        "can flip symbols under mixed precision). Also via TPC_STRICT_F32=1.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("models", help="list available models")
    sp.set_defaults(fn=cmd_models)

    sp = sub.add_parser("compress", help="compress a PNG to .tfci")
    sp.add_argument("model")
    sp.add_argument("input")
    sp.add_argument("output", nargs="?")
    sp.add_argument("--allow-random", action="store_true")
    sp.add_argument(
        "--rd_parameter", type=int, default=None,
        help="runtime rate point for variable-rate models (b2018-*); "
        "equivalent to the -N quality suffix (reference tfci.py flag)",
    )
    sp.add_argument(
        "--device-coder", action="store_true",
        help="entropy-code the main latent ON the accelerator (K-lane "
        "rANS) instead of the host range coder — only compressed words "
        "cross the device link (bmshj2018 family only; decompress "
        "auto-detects the format)",
    )
    sp.add_argument(
        "--spatial", type=int, default=None, metavar="N",
        help="giant-image mode: run the transforms H-sharded over an "
        "N-device mesh (halo exchange over ICI); entropy coding stays on "
        "the host. Decode a spatially-coded stream with the same mesh "
        "size for guaranteed bit-exact row math",
    )
    sp.set_defaults(fn=cmd_compress)

    sp = sub.add_parser("decompress", help="decompress a .tfci to PNG")
    sp.add_argument("input")
    sp.add_argument("output", nargs="?")
    sp.add_argument("--allow-random", action="store_true")
    sp.add_argument(
        "--jit", action="store_true",
        help="decode through the single-compiled-program path (entropy "
        "decoding via in-jit callbacks; bmshj2018 family only)",
    )
    sp.add_argument(
        "--spatial", type=int, default=None, metavar="N",
        help="giant-image mode: run the transforms H-sharded over an "
        "N-device mesh (halo exchange over ICI); entropy coding stays on "
        "the host. Decode a spatially-coded stream with the same mesh "
        "size for guaranteed bit-exact row math",
    )
    sp.set_defaults(fn=cmd_decompress)

    sp = sub.add_parser("dump", help="inspect a .tfci container")
    sp.add_argument("input")
    sp.add_argument(
        "--output", default=None,
        help="also extract every packed tensor to this .npz (reference "
        "tfci.py dump writes named tensors out; bytes features land as "
        "uint8 arrays)",
    )
    sp.set_defaults(fn=cmd_dump)

    sp = sub.add_parser("eval", help="R-D evaluation over an image glob")
    sp.add_argument("model")
    sp.add_argument("glob")
    sp.add_argument("--csv", default=None)
    sp.add_argument("--allow-random", action="store_true")
    sp.add_argument(
        "--lpips", action="store_true",
        help="add an LPIPS column (needs converted weights for parity; "
        "random-VGG fallback is smoke-grade and warns)",
    )
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("train", help="train a model into the local registry")
    sp.add_argument("model")
    sp.add_argument("--glob", default=None)
    sp.add_argument("--steps", type=int, default=10000)
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--patch-size", type=int, default=256)
    sp.add_argument("--lmbda", type=float, default=None)
    sp.add_argument("--num-devices", type=int, default=1)
    sp.add_argument("--checkpoint-every", type=int, default=500)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument(
        "--lr-schedule", default="constant",
        choices=("constant", "step", "cosine"),
        help="lr over [0, steps]: step = 10x drop at 85%% (reference "
             "recipe), cosine = smooth decay to lr * lr-final-scale",
    )
    sp.add_argument("--lr-final-scale", type=float, default=0.1)
    sp.add_argument(
        "--gan-warmup", type=int, default=0, metavar="N",
        help="HiFiC only: train the generator on mse+lpips+rate for the "
             "first N steps before enabling the GAN term and the "
             "discriminator updates (HificConfig.gan_warmup_steps)",
    )
    sp.add_argument(
        "--rate-probe-glob", default=None, metavar="GLOB",
        help="HiFiC only: hinge the rate controller on the measured bpp "
             "of these full-resolution TRAIN-distribution images instead "
             "of the training-patch bpp (closes the patch-vs-eval rate "
             "statistics gap; HificConfig.rate_probe_glob)",
    )
    sp.add_argument("--rate-probe-every", type=int, default=100)
    sp.add_argument(
        "--hinge-softness", type=float, default=0.0, metavar="S",
        help="HiFiC only: log-proportional rate controller — lambda "
             "interpolates lambda_b -> lambda_a geometrically over rate in "
             "[target/2^S, target*2^S]; 0 = reference two-lambda bang-bang "
             "(HificConfig.hinge_softness)",
    )
    sp.add_argument(
        "--probe-ema", type=float, default=0.0, metavar="A",
        help="HiFiC only: EMA smoothing of the rate-probe sensor, "
             "0 <= A < 1 (HificConfig.probe_ema)",
    )
    sp.add_argument(
        "--hinge-integral", type=float, default=0.0, metavar="KI",
        help="HiFiC only: integral rate controller — at every probe "
             "refresh lambda *= (ema_rate/target)^KI, clipped to "
             "[lambda_b, lambda_a]; no steady-state droop, requires "
             "--rate-probe-glob (HificConfig.hinge_integral)",
    )
    sp.add_argument(
        "--k-mse-scale", type=float, default=1.0, metavar="S",
        help="HiFiC only: scale the MSE loss weight by S "
             "(LPIPS-absent rebalancing — with random-init VGG the "
             "perceptual term is inert and the paper's balance leaves "
             "reconstructions GAN-dominated; HificConfig.k_mse_scale)",
    )
    sp.add_argument(
        "--init-from", default=None, metavar="MODEL",
        help="warm-start parameters from another trained model of the "
             "same family (fine-tuning, e.g. -msssim from its -mse twin)",
    )
    sp.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    if args.strict_f32:
        import jax

        # Global, set before any trace: everything under jit compiles with
        # float32 matmul/conv accumulation semantics.
        jax.config.update("jax_default_matmul_precision", "highest")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
