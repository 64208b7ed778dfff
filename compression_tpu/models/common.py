"""Shared model-zoo machinery: datasets, train loop, CLI scaffolding.

The reference drives each codec from a self-contained script with
train/compress/decompress verbs built on Keras `model.fit` and tf.data
(reference: models/bls2017.py:≈230-340). Here the equivalents are:

* an index-shuffled NumPy crop pipeline feeding jitted steps (the models are
  conv codecs on 256x256 crops — input pipeline is never the bottleneck; a
  synthetic-noise fallback keeps smoke training runnable with no dataset),
* one optax/orbax training loop shared by every model (single-chip `jit` or
  data-parallel `shard_map` over a mesh via
  :mod:`compression_tpu.parallel.data_parallel`),
* a tiny argparse scaffold the model scripts plug their verbs into.
"""

from __future__ import annotations

import dataclasses
import glob as globlib
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.util import image as image_util

__all__ = [
    "TrainConfig",
    "crop_dataset",
    "train_model",
    "save_checkpoint",
    "load_checkpoint",
]


def distortion_loss(x, x_hat, kind: str = "mse"):
    """Distortion term for the R-D losses, selected by config (the
    reference ships separate ``-mse`` and ``-msssim`` model variants per
    family; reference models/tfci.py model list).

    Returns ``(loss_term, metric_name, metric_value)``:
      mse:    255^2-scaled mean squared error (metric = the same).
      msssim: ``1 - MS-SSIM`` on the [0, 1] images (single-scale SSIM when
              the training patch is below MS-SSIM's 176px minimum —
              training recipes should use >= 176px patches; metric = the
              similarity itself).
    """
    if kind == "mse":
        mse = jnp.mean(jnp.square(x - x_hat)) * (255.0**2)
        return mse, "mse", mse
    if kind == "msssim":
        fn = (
            image_util.msssim
            if min(x.shape[1], x.shape[2]) >= 176
            else image_util.ssim
        )
        sim = jnp.mean(fn(x, jnp.clip(x_hat, 0.0, 1.0), max_val=1.0))
        return 1.0 - sim, "msssim", sim
    raise ValueError(f"unknown distortion {kind!r} (mse | msssim)")


@dataclasses.dataclass
class TrainConfig:
    train_glob: Optional[str] = None   # image file glob; None = synthetic
    batch_size: int = 8
    patch_size: int = 256
    learning_rate: float = 1e-4
    # Learning-rate schedule over [0, steps]: "constant" | "step" | "cosine".
    # "step" drops the lr by lr_final_scale at lr_drop_frac * steps (the
    # reference recipe: constant 1e-4, 10x drop for the final stretch);
    # "cosine" decays smoothly to learning_rate * lr_final_scale.
    lr_schedule: str = "constant"
    lr_final_scale: float = 0.1
    lr_drop_frac: float = 0.85
    steps: int = 1_000_000
    log_every: int = 100
    checkpoint_every: int = 5000
    checkpoint_dir: Optional[str] = None
    checkpoint_name: str = "checkpoint.msgpack"  # per-model to avoid clashes
    seed: int = 0
    num_devices: int = 1               # data-parallel width (mesh axis)
    # Optional per-parameter-group lr multipliers: ((path_prefix, scale),
    # ...) matched against "params/..."-style key paths. Used by models
    # whose auxiliary parameters need a faster clock than the transforms
    # (b2018's per-quality priors/gains must travel ~10x further than conv
    # kernels within the same step budget).
    lr_scales: Optional[tuple] = None
    # Dihedral augmentation of each crop (flips + transpose, an 8-element
    # orbit). On small train sets the mean-conditioned models otherwise
    # memorize exact latent layouts (mu reproduces training images, then
    # mispredicts held-out ones and the escape-coded residuals blow up the
    # rate — see tools/make_synthetic_set.py). Square patches only.
    augment: bool = True


def write_metrics_row(
    checkpoint_dir: str, checkpoint_name: str, step: int, m: dict, rate: float
) -> None:
    """Metrics sink (the reference's TensorBoard-scalars role): an
    append-only CSV next to the checkpoints. If a resumed run's metric
    set changed (e.g. a loss recipe revision dropping a column), the old
    file is rotated aside rather than appending misaligned rows under a
    stale header."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    csv_path = os.path.join(checkpoint_dir, checkpoint_name + ".metrics.csv")
    keys = sorted(m)
    header = "step," + ",".join(keys) + ",img_per_s\n"
    new_file = not os.path.exists(csv_path)
    if not new_file:
        with open(csv_path) as f:
            old_header = f.readline()
        if old_header != header:
            os.replace(csv_path, csv_path + ".prev")
            new_file = True
    with open(csv_path, "a") as f:
        if new_file:
            f.write(header)
        f.write(
            f"{step},"
            + ",".join(f"{m[k]:.6g}" for k in keys)
            + f",{rate:.2f}\n"
        )


def _load_images(pattern: str, max_images: int = 2000):
    paths = sorted(globlib.glob(pattern))[:max_images]
    if not paths:
        raise FileNotFoundError(f"no images match {pattern!r}")
    return [image_util.read_png(p) for p in paths]


def crop_dataset(cfg: TrainConfig) -> Iterator[np.ndarray]:
    """Yields training batches of shape (B, P, P, 3), forever.

    Image-backed batches are yielded as **uint8**: the training step
    normalizes to float32/255 on the device (same IEEE ops, identical
    values), so only a quarter of the bytes cross the host->device link —
    on the tunneled chip the batch transfer is the training bottleneck
    (measured 0.7 steps/s shipping f32 vs the compute-bound rate). The
    synthetic fallback (no train_glob) yields float32 in [0, 1] as before.
    """
    rng = np.random.RandomState(cfg.seed)
    p = cfg.patch_size
    images = None
    if cfg.train_glob:
        images = [
            im for im in _load_images(cfg.train_glob)
            if im.shape[0] >= p and im.shape[1] >= p
        ]
        if not images:
            raise ValueError(f"no images >= {p}x{p} in {cfg.train_glob!r}")
    while True:
        if images is None:
            # Synthetic fallback: smooth random fields (keeps smoke
            # training meaningful — compressible, non-trivial statistics).
            batch = np.empty((cfg.batch_size, p, p, 3), np.float32)
            for b in range(cfg.batch_size):
                base = rng.randn(p // 8, p // 8, 3).astype(np.float32)
                up = np.kron(base, np.ones((8, 8, 1), np.float32))
                batch[b] = 1 / (1 + np.exp(-up))
            yield batch
            continue
        batch = np.empty((cfg.batch_size, p, p, 3), np.uint8)
        for b in range(cfg.batch_size):
            im = images[rng.randint(len(images))]
            y = rng.randint(im.shape[0] - p + 1)
            x = rng.randint(im.shape[1] - p + 1)
            crop = im[y : y + p, x : x + p]
            if cfg.augment:
                if rng.rand() < 0.5:
                    crop = crop[::-1]
                if rng.rand() < 0.5:
                    crop = crop[:, ::-1]
                if crop.shape[0] == crop.shape[1] and rng.rand() < 0.5:
                    crop = crop.transpose(1, 0, 2)
            batch[b] = crop
        yield batch


def save_checkpoint(path: str, params, step: int, opt_state=None) -> None:
    """Serializes params (and optionally optimizer state) via flax msgpack.

    Written atomically (tmp + rename) so a crash mid-write never corrupts
    the resumable checkpoint — the BackupAndRestore role of the reference's
    training scripts (SURVEY.md §5 checkpoint row).
    """
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = {"params": params, "step": step}
    if opt_state is not None:
        state["opt_state"] = opt_state
    # Fetch device arrays with one pipelined transfer wave, not leaf-by-leaf
    # inside msgpack packing: to_bytes() would otherwise np.asarray() each of
    # the hundreds of param/opt leaves synchronously, paying a full
    # device->host round-trip latency per leaf — on a tunneled chip that
    # turns a ~1 GB CHARM checkpoint into tens of minutes. Kicking off all
    # copies async first makes the write bandwidth-bound instead.
    for leaf in jax.tree_util.tree_leaves(state):
        if hasattr(leaf, "copy_to_host_async"):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
    state = jax.device_get(state)
    blob = serialization.to_bytes(state)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Returns (params, step) or (params, step, opt_state) when a template
    for the optimizer state is given."""
    from flax import serialization

    with open(path, "rb") as f:
        blob = f.read()
    template = {"params": params_template, "step": 0}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    state = serialization.from_bytes(template, blob)
    if opt_state_template is not None:
        return state["params"], state["step"], state["opt_state"]
    return state["params"], state["step"]


def _scale_by_path(scales):
    """Optax transform multiplying updates whose key path starts with a
    configured prefix (paths rendered like ``params/gain``)."""

    def path_key(path) -> str:
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
        return "/".join(parts)

    def update(updates, state, params=None):
        del params

        def scale(path, u):
            key = path_key(path)
            s = 1.0
            for prefix, sc in scales:
                if key.startswith(prefix):
                    s = sc
            return u * s

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(lambda params: (), update)


def train_model(
    init_fn: Callable,
    loss_fn: Callable,
    cfg: TrainConfig,
    *,
    params=None,
    hooks: Optional[Callable] = None,
):
    """Generic training loop.

    Args:
      init_fn: (rng, example_batch) -> params pytree.
      loss_fn: (params, batch, rng) -> (loss, metrics dict). Pure; jitted
        here (and wrapped for data parallelism when cfg.num_devices > 1).
      cfg: TrainConfig.
      params: optional initial params (resume).
      hooks: optional callable(step, metrics) for logging.

    Returns:
      Trained params.
    """
    data = crop_dataset(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    batch0 = np.asarray(next(data))
    if batch0.dtype == np.uint8:  # init traces want the model's float input
        batch0 = batch0.astype(np.float32) / 255.0
    batch0 = jnp.asarray(batch0)
    if params is None:
        rng, init_rng = jax.random.split(rng)
        params = init_fn(init_rng, batch0)

    # uint8-on-the-wire: image batches arrive as uint8 (see crop_dataset)
    # and are normalized to float32/255 *inside* the jitted step, on the
    # device — bit-identical to host-side normalization, 4x less transfer.
    def _loss_fn(params, batch, step_rng):
        if batch.dtype == jnp.uint8:
            batch = batch.astype(jnp.float32) / 255.0
        return loss_fn(params, batch, step_rng)

    if cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    elif cfg.lr_schedule == "step":
        lr = optax.piecewise_constant_schedule(
            cfg.learning_rate,
            {int(cfg.steps * cfg.lr_drop_frac): cfg.lr_final_scale},
        )
    elif cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.steps, alpha=cfg.lr_final_scale
        )
    else:
        raise ValueError(
            f"unknown lr_schedule {cfg.lr_schedule!r} (constant|step|cosine)"
        )
    tx = optax.adam(lr)
    if cfg.lr_scales:
        tx = optax.chain(tx, _scale_by_path(cfg.lr_scales))
    opt_state = tx.init(params)
    start_step = 0
    if cfg.checkpoint_dir:
        resume_path = os.path.join(cfg.checkpoint_dir, cfg.checkpoint_name)
        if os.path.exists(resume_path):
            try:
                params, start_step, opt_state = load_checkpoint(
                    resume_path, params, opt_state
                )
                print(f"resumed from {resume_path} @ step {start_step}")
            except Exception:
                # Older params-only checkpoint: resume weights, fresh opt.
                params, start_step = load_checkpoint(resume_path, params)
                opt_state = tx.init(params)
                print(f"resumed (params only) from {resume_path} @ {start_step}")

    if cfg.num_devices > 1:
        from compression_tpu.parallel.data_parallel import make_dp_step

        if cfg.batch_size % cfg.num_devices:
            raise ValueError(
                f"batch_size ({cfg.batch_size}) must be divisible by "
                f"num_devices ({cfg.num_devices}) for data parallelism"
            )
        step_fn = make_dp_step(_loss_fn, tx, cfg.num_devices)
    else:

        @jax.jit
        def step_fn(params, opt_state, batch, step_rng):
            (loss, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
                params, batch, step_rng
            )
            updates, new_opt = tx.update(grads, opt_state, params)
            return (
                optax.apply_updates(params, updates),
                new_opt,
                {"loss": loss, **metrics},
            )

    t0 = time.time()
    for step in range(start_step + 1, cfg.steps + 1):
        rng, step_rng = jax.random.split(rng)
        batch = jnp.asarray(next(data))
        params, opt_state, metrics = step_fn(params, opt_state, batch, step_rng)
        if step % cfg.log_every == 0 or step == cfg.steps:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (step - start_step) * cfg.batch_size / (time.time() - t0)
            line = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
            print(f"step {step}: {line} ({rate:.1f} img/s)")
            if cfg.checkpoint_dir:
                write_metrics_row(
                    cfg.checkpoint_dir, cfg.checkpoint_name, step, m, rate
                )
            if hooks:
                hooks(step, m)
        if cfg.checkpoint_dir and (
            step % cfg.checkpoint_every == 0 or step == cfg.steps
        ):
            save_checkpoint(
                os.path.join(cfg.checkpoint_dir, cfg.checkpoint_name),
                params,
                step,
                opt_state,
            )
    return params
