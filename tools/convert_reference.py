"""Reference checkpoint converter: TFC SavedModel -> our msgpack params.

Required for the bit-exactness milestone (SURVEY.md §5 checkpoint row,
§7 hard part 6): ingests a trained reference model's weights and emits a
msgpack param file for the matching compression_tpu model. Conversion goes
through *effective* weights — the reference stores GDN beta/gamma
sqrt-reparameterized (GDNParameter, pedestal 2^-36) and optionally conv
kernels in the real-DFT basis (RDFTParameter); both are inverted to the
effective value and re-reparameterized into this framework's storage space.

All five model families are mapped (bls2017 / bmshj2018 / mbt2018 /
ms2020 / hific generator-side). A conversion that cannot account for every
destination leaf, or leaves reference weight variables unconsumed, RAISES
with the full list (round-1 verdict: a silent partial mapping emits a
checkpoint that loads and produces garbage).

Variable-name schema: the reference mount is empty (SURVEY.md provenance
note), so the expected reference names below follow the upstream
tensorflow/compression model scripts (reference: models/bls2017.py,
models/bmshj2018.py, models/ms2020.py layer names) and are matched
*tolerantly* (any scope prefix; `reparam_`/plain, `:0` suffixes ignored).
`tools/make_reference_savedmodel.py` builds a TF SavedModel with this exact
schema so the converter is dry-runnable end-to-end without the mount;
re-verify the schema against a real checkpoint once one is available.

Usage:
  python tools/convert_reference.py --saved_model /path/to/sm \
      --family bmshj2018 --out ~/.cache/compression_tpu/bmshj2018.msgpack
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict, List, Tuple

import numpy as np

_PEDESTAL = (2.0 ** -18) ** 2  # TFC GDNParameter pedestal (= ours)


# ---------------------------------------------------------------------------
# Reference-variable access (tolerant name matching)
# ---------------------------------------------------------------------------


class RefVars:
    """Wraps the reference name->array dict with tolerant lookup and
    consumption tracking (unconsumed vars are an error at the end)."""

    def __init__(self, variables: Dict[str, np.ndarray]):
        self.vars = {self._norm(k): np.asarray(v) for k, v in variables.items()}
        self.consumed: set = set()

    @staticmethod
    def _norm(name: str) -> str:
        name = name.split(":")[0]          # strip ':0'
        return name.strip("/").lower()

    def find(self, *patterns: str) -> Tuple[str, np.ndarray]:
        """First variable whose normalized name matches any regex, searched
        in the given order. Raises KeyError listing candidates."""
        for pat in patterns:
            rx = re.compile(pat)
            hits = sorted(k for k in self.vars if rx.search(k))
            if len(hits) > 1:
                # Prefer an unconsumed hit; ambiguity among those is an error.
                hits = [h for h in hits if h not in self.consumed] or hits
            if hits:
                if len(hits) > 1:
                    raise KeyError(
                        f"pattern {pat!r} is ambiguous: {hits[:6]}"
                    )
                self.consumed.add(hits[0])
                return hits[0], self.vars[hits[0]]
        raise KeyError(
            f"no reference variable matches any of {patterns}; "
            f"have {sorted(self.vars)[:12]}..."
        )

    def unconsumed(self) -> List[str]:
        return sorted(set(self.vars) - self.consumed)


# ---------------------------------------------------------------------------
# Reparameterization inversions (reference storage -> effective -> ours)
# ---------------------------------------------------------------------------


def _gdn_effective(stored: np.ndarray) -> np.ndarray:
    """TFC GDNParameter storage -> effective value (v^2 - pedestal)."""
    return np.square(np.asarray(stored, np.float64)) - _PEDESTAL


def _gdn_to_ours(effective: np.ndarray) -> np.ndarray:
    """Effective (>=0) value -> our sqrt storage space."""
    eff = np.maximum(np.asarray(effective, np.float64), 0.0)
    return np.sqrt(eff + _PEDESTAL).astype(np.float32)


def _rdft_to_effective(coeffs: np.ndarray, support: Tuple[int, int]) -> np.ndarray:
    """TFC RDFTParameter coefficients -> effective (kh, kw, cin, cout) kernel."""
    sys.path.insert(0, ".")
    from compression_tpu.layers.parameters import rdft_basis

    kh, kw = support
    n = kh * kw
    basis = rdft_basis(n)  # coeffs = B @ flat kernel
    flat = basis.T @ np.asarray(coeffs, np.float64).reshape(n, -1)
    return flat.reshape(kh, kw, *coeffs.shape[1:]) if coeffs.ndim > 2 else flat


class RdftKernel:
    """Deferred RDFT-parameterized kernel: the spatial support needed to
    invert the basis comes from the destination template at assembly time.
    Opaque single leaf to jax.tree_util (deliberately not a pytree)."""

    def __init__(self, name: str, coeffs: np.ndarray):
        self.name = name
        self.coeffs = np.asarray(coeffs)

    def resolve(self, shape) -> np.ndarray:
        kh, kw = shape[:2]
        eff = _rdft_to_effective(self.coeffs, (kh, kw))
        return np.asarray(eff, np.float32).reshape(shape)


def conv_from_ref(ref: RefVars, scope: str, layer: str, *, bias: bool):
    """Reads one SignalConv layer's effective kernel (+bias).

    Accepts a plain `kernel` (effective) or an `rdft_kernel` coefficient
    block (inverted through the orthonormal RDFT basis).
    """
    out = {}
    try:
        _, k = ref.find(rf"(^|/){scope}/{layer}/kernel$")
        out["kernel"] = np.asarray(k, np.float32)
    except KeyError:
        name, k = ref.find(rf"(^|/){scope}/{layer}/rdft_kernel$")
        out["kernel"] = RdftKernel(name, k)
    if bias:
        _, b = ref.find(rf"(^|/){scope}/{layer}/bias$")
        out["bias"] = np.asarray(b, np.float32)
    return out


def gdn_from_ref(ref: RefVars, scope: str, layer: str, gdn: str):
    """Reads a GDN's beta/gamma (either reparam_* storage or effective)."""
    out = {}
    for name in ("beta", "gamma"):
        try:
            _, v = ref.find(rf"(^|/){scope}/{layer}/{gdn}/reparam_{name}$")
            eff = _gdn_effective(v)
        except KeyError:
            _, v = ref.find(rf"(^|/){scope}/{layer}/{gdn}/{name}$")
            eff = np.asarray(v, np.float64)
        out[name] = _gdn_to_ours(eff)
    return out


def prior_from_ref(ref: RefVars, scope: str):
    """Reads a DeepFactorized prior (matrices/biases/factors are stored raw
    in both frameworks — softplus/tanh applied at use — so they map 1:1).

    Returns the pytree matching DeepFactorizedPrior's param: a 3-tuple
    (matrices, biases, factors) of tuples."""
    matrices, biases, factors = [], [], []
    for i in range(16):
        try:
            _, m = ref.find(rf"(^|/){scope}.*matrix_{i}$")
        except KeyError:
            break
        matrices.append(np.asarray(m, np.float32))
        _, b = ref.find(rf"(^|/){scope}.*bias_{i}$")
        biases.append(np.asarray(b, np.float32))
        try:
            _, f = ref.find(rf"(^|/){scope}.*factor_{i}$")
            factors.append(np.asarray(f, np.float32))
        except KeyError:
            pass  # last layer has no factor
    if not matrices:
        raise KeyError(f"no DeepFactorized variables under scope {scope!r}")
    if len(factors) != len(matrices) - 1:
        raise ValueError(
            f"prior under {scope!r}: {len(matrices)} matrices need "
            f"{len(matrices) - 1} factors, found {len(factors)}"
        )
    # Build the actual DeepFactorized pytree so the converted tree's
    # structure is IDENTICAL to a model.init template (flax serializes the
    # dataclass pytree, not a bare tuple-of-tuples).
    sys.path.insert(0, ".")
    from compression_tpu.distributions.deep_factorized import DeepFactorized

    return DeepFactorized(tuple(matrices), tuple(biases), tuple(factors))


# ---------------------------------------------------------------------------
# Family mappings. Reference scope names follow the upstream model scripts
# (see module docstring); ours follow the param trees of
# compression_tpu/models/*.py.
# ---------------------------------------------------------------------------


def _transform(ref, ref_scope, convs, gdns, gdn_name="gdn"):
    """Maps one Sequential transform: convs = [(our_name, ref_layer, bias)],
    gdns = [(our_name, ref_layer, ref_gdn)]."""
    out = {}
    for our, layer, bias in convs:
        out[our] = conv_from_ref(ref, ref_scope, layer, bias=bias)
    for our, layer, g in gdns:
        out[our] = gdn_from_ref(ref, ref_scope, layer, g)
    return out


def convert_bls2017(ref: RefVars) -> dict:
    p = {}
    p["analysis"] = _transform(
        ref, "analysis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", False)],
        [("gdn0", "layer_0", "gdn_0"), ("gdn1", "layer_1", "gdn_1")],
    )
    p["synthesis"] = _transform(
        ref, "synthesis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", True)],
        [("igdn0", "layer_0", "igdn_0"), ("igdn1", "layer_1", "igdn_1")],
    )
    p["prior"] = {"deep_factorized": prior_from_ref(ref, "entropy_model")}
    return {"params": p}


def convert_bmshj2018_factorized(ref: RefVars) -> dict:
    """bmshj2018's factorized-prior baseline: the four-conv transform pair
    with a DeepFactorized prior directly on y (reference zoo
    `bmshj2018-factorized-*`; models/tfci.py model list). Destination is
    BLS2017Model with arch="bmshj2018"."""
    analysis, synthesis, _ = _hyperprior_transforms(ref, hyper=False)
    return {"params": {
        "analysis": analysis, "synthesis": synthesis,
        "prior": {"deep_factorized": prior_from_ref(ref, "entropy_model")},
    }}


def _hyperprior_transforms(ref, hyper: bool = True):
    """The four-conv analysis/synthesis shared by bmshj2018/mbt2018/ms2020."""
    analysis = _transform(
        ref, "analysis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", True), ("conv3", "layer_3", False)],
        [("gdn0", "layer_0", "gdn_0"), ("gdn1", "layer_1", "gdn_1"),
         ("gdn2", "layer_2", "gdn_2")],
    )
    synthesis = _transform(
        ref, "synthesis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", True), ("conv3", "layer_3", True)],
        [("igdn0", "layer_0", "igdn_0"), ("igdn1", "layer_1", "igdn_1"),
         ("igdn2", "layer_2", "igdn_2")],
    )
    if not hyper:
        return analysis, synthesis, None
    hyper_analysis = _transform(
        ref, "hyper_analysis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", False)],
        [],
    )
    return analysis, synthesis, hyper_analysis


def convert_bmshj2018(ref: RefVars) -> dict:
    analysis, synthesis, hyper_analysis = _hyperprior_transforms(ref)
    hyper_synthesis = _transform(
        ref, "hyper_synthesis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", True)],
        [],
    )
    return {"params": {
        "analysis": analysis, "synthesis": synthesis,
        "hyper_analysis": hyper_analysis, "hyper_synthesis": hyper_synthesis,
        "hyperprior": {"deep_factorized": prior_from_ref(ref, "entropy_model")},
    }}


# mbt2018's hyper-synthesis predicts (mu, sigma); same layer layout.
convert_mbt2018 = convert_bmshj2018


def convert_ms2020(ref: RefVars, num_slices: int = 10) -> dict:
    analysis, synthesis, hyper_analysis = _hyperprior_transforms(ref)
    p = {
        "analysis": analysis, "synthesis": synthesis,
        "hyper_analysis": hyper_analysis,
        "hyperprior": {"deep_factorized": prior_from_ref(ref, "entropy_model")},
    }
    # Two hyper-synthesis halves (reference ms2020.py: hyper_synthesis_mean
    # / hyper_synthesis_scale), three convs each.
    for ours, scope in (
        ("mean_support", "hyper_synthesis_mean"),
        ("scale_support", "hyper_synthesis_scale"),
    ):
        p[ours] = _transform(
            ref, scope,
            [("conv0", "layer_0", True), ("conv1", "layer_1", True),
             ("conv2", "layer_2", True)],
            [],
        )
    # Per-slice CC mean/scale + LRP transforms (reference ms2020.py:
    # cc_mean_transforms / cc_scale_transforms / lrp_transforms).
    for i in range(num_slices):
        for ours, scope in (
            (f"mean_t{i}", f"cc_mean_{i}"),
            (f"scale_t{i}", f"cc_scale_{i}"),
            (f"lrp_t{i}", f"lrp_{i}"),
        ):
            p[ours] = _transform(
                ref, scope,
                [("conv0", "layer_0", True), ("conv1", "layer_1", True),
                 ("conv2", "layer_2", True)],
                [],
            )
    return {"params": p}


def convert_hific(ref: RefVars, num_residual_blocks: int = 9) -> dict:
    """Generator-side HiFiC weights (what our checkpoint stores): encoder,
    generator, hyper transforms, hyperprior. Reference scopes follow
    models/hific/archs.py block names."""
    p = {}
    enc = {}
    enc.update(_transform(ref, "encoder", [("conv0", "layer_0", True)], []))
    for i in range(1, 5):
        enc.update(_transform(
            ref, "encoder", [(f"conv{i}", f"layer_{i}", True)], []
        ))
    enc.update(_transform(
        ref, "encoder", [("conv_out", "layer_out", True)], []
    ))
    for i in range(5):
        _, g = ref.find(rf"(^|/)encoder/norm_{i}/gamma$")
        _, b = ref.find(rf"(^|/)encoder/norm_{i}/beta$")
        enc[f"norm{i}"] = {"gamma": np.asarray(g, np.float32),
                           "beta": np.asarray(b, np.float32)}
    p["encoder"] = enc

    gen = {}
    gen.update(_transform(
        ref, "generator",
        [("conv_in", "layer_in", True), ("conv_out", "layer_out", True)],
        [],
    ))
    for our, scope in (("norm_in", "norm_in"), ("norm_head", "norm_head")):
        _, g = ref.find(rf"(^|/)generator/{scope}/gamma$")
        _, b = ref.find(rf"(^|/)generator/{scope}/beta$")
        gen[our] = {"gamma": np.asarray(g, np.float32),
                    "beta": np.asarray(b, np.float32)}
    for i in range(num_residual_blocks):
        blk = _transform(
            ref, f"generator/res_{i}",
            [("conv0", "conv_0", True), ("conv1", "conv_1", True)],
            [],
        )
        for j in range(2):
            _, g = ref.find(rf"(^|/)generator/res_{i}/norm_{j}/gamma$")
            _, b = ref.find(rf"(^|/)generator/res_{i}/norm_{j}/beta$")
            blk[f"norm{j}"] = {"gamma": np.asarray(g, np.float32),
                               "beta": np.asarray(b, np.float32)}
        gen[f"res{i}"] = blk
    for i in range(4):
        gen.update(_transform(
            ref, "generator", [(f"up{i}", f"up_{i}", True)], []
        ))
        _, g = ref.find(rf"(^|/)generator/upnorm_{i}/gamma$")
        _, b = ref.find(rf"(^|/)generator/upnorm_{i}/beta$")
        gen[f"upnorm{i}"] = {"gamma": np.asarray(g, np.float32),
                             "beta": np.asarray(b, np.float32)}
    p["generator"] = gen

    p["hyper_analysis"] = _transform(
        ref, "hyper_analysis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", False)],
        [],
    )
    p["hyper_synthesis"] = _transform(
        ref, "hyper_synthesis",
        [("conv0", "layer_0", True), ("conv1", "layer_1", True),
         ("conv2", "layer_2", True)],
        [],
    )
    p["hyperprior"] = {
        "deep_factorized": prior_from_ref(ref, "entropy_model")
    }
    return {"params": p}


FAMILIES = {
    "bls2017": convert_bls2017,
    "bmshj2018": convert_bmshj2018,
    "bmshj2018_factorized": convert_bmshj2018_factorized,
    "mbt2018": convert_mbt2018,
    "ms2020": convert_ms2020,
    "hific": convert_hific,
}


# ---------------------------------------------------------------------------
# Assembly against the destination template (shape check + RDFT resolution)
# ---------------------------------------------------------------------------


def validate_against_template(converted: dict, template: dict):
    """Checks the converted tree covers the template exactly (same paths,
    same shapes), resolving deferred RDFT kernels. Raises on ANY mismatch —
    a partial conversion must never be written out (round-1 verdict).

    Returns the converted leaves re-assembled with the TEMPLATE's treedef,
    so the result serializes/loads exactly like a model.init pytree."""
    import jax

    keystr = jax.tree_util.keystr
    c_flat, _ = jax.tree_util.tree_flatten_with_path(
        converted, is_leaf=lambda x: isinstance(x, RdftKernel)
    )
    t_flat, t_treedef = jax.tree_util.tree_flatten_with_path(template)
    c_map = {keystr(p): v for p, v in c_flat}
    t_map = {keystr(p): v for p, v in t_flat}
    missing = sorted(set(t_map) - set(c_map))
    extra = sorted(set(c_map) - set(t_map))
    if missing or extra:
        raise ValueError(
            f"conversion incomplete: {len(missing)} unmapped destination "
            f"leaves {missing[:8]}{'...' if len(missing) > 8 else ''}; "
            f"{len(extra)} unexpected source leaves "
            f"{extra[:8]}{'...' if len(extra) > 8 else ''}"
        )
    bad = []
    out_leaves = []
    for p, tv in t_flat:
        cv = c_map[keystr(p)]
        if isinstance(cv, RdftKernel):
            cv = cv.resolve(np.asarray(tv).shape)
        if tuple(np.shape(cv)) != tuple(np.shape(tv)):
            bad.append((keystr(p), np.shape(cv), np.shape(tv)))
        out_leaves.append(np.asarray(cv, np.asarray(tv).dtype))
    if bad:
        raise ValueError(f"shape mismatches (converted vs expected): {bad[:8]}")
    return jax.tree_util.tree_unflatten(t_treedef, out_leaves)


def make_template(family: str, **cfg_overrides):
    """Init-shaped param pytree for the destination model (host CPU)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    import dataclasses as dc

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    if family == "hific":
        from compression_tpu.models import hific

        cfg = hific.get_config("hific-mi")
        if cfg_overrides:
            cfg = dc.replace(cfg, **cfg_overrides)
        model = hific.HificModel(cfg)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        return jax.tree_util.tree_map(
            np.asarray,
            model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1),
                       training=True),
        )
    import importlib

    if family == "bmshj2018_factorized":
        from compression_tpu.models import bls2017

        kw = dict(num_filters=192, num_latents=192)
        kw.update({
            k: v for k, v in cfg_overrides.items()
            if k in {f.name for f in dc.fields(bls2017.Config)}
        })
        cfg = bls2017.Config(
            arch="bmshj2018", model_name="bmshj2018-factorized", **kw
        )
        model = bls2017.BLS2017Model(cfg)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        return jax.tree_util.tree_map(
            np.asarray,
            model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1),
                       training=True),
        )
    mod = importlib.import_module(f"compression_tpu.models.{family}")
    cfg = mod.Config(**cfg_overrides)
    model = getattr(mod, f"{family.upper()}Model", None) or getattr(
        mod, {"bls2017": "BLS2017Model", "bmshj2018": "BMSHJ2018Model",
              "mbt2018": "MBT2018Model", "ms2020": "MS2020Model"}[family]
    )
    model = model(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    return jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1),
                   training=True),
    )


def load_reference_variables(saved_model_dir: str) -> dict:
    """Loads variable name -> np.ndarray from a TF SavedModel."""
    import tensorflow as tf  # local import: offline tool only

    loaded = tf.saved_model.load(saved_model_dir)
    # The restored root exposes its variables under different attributes
    # across TF versions / object graphs: plain tf.Module roots have
    # `.variables`; checkpoint-restored _UserObject roots only
    # `.all_variables` (observed TF 2.20 restoring our synthetic
    # SavedModel). Take whichever exists.
    var_list = None
    for attr in ("variables", "all_variables", "trainable_variables"):
        var_list = getattr(loaded, attr, None)
        if var_list:
            break
    if not var_list:
        raise ValueError(
            f"SavedModel at {saved_model_dir} exposes no variable "
            f"collection (tried variables/all_variables)"
        )
    out = {}
    for v in var_list:
        out[v.name] = v.numpy()
    return out


def convert(ref_vars: dict, family: str, template=None, **family_kwargs):
    """Full conversion: map, verify coverage both ways, validate shapes."""
    ref = RefVars(ref_vars)
    converted = FAMILIES[family](ref, **family_kwargs)
    leftovers = [
        v for v in ref.unconsumed()
        # Optimizer slots / step counters in reference checkpoints are fine
        # to ignore; weight-looking leftovers are not.
        if not re.search(r"(adam|optimizer|step|beta_1|beta_2|iter)", v)
    ]
    if leftovers:
        raise ValueError(
            f"{len(leftovers)} reference weight variables were never "
            f"consumed by the {family} mapping: {leftovers[:8]}"
            f"{'...' if len(leftovers) > 8 else ''}"
        )
    if template is not None:
        converted = validate_against_template(converted, template)
    return converted


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--saved_model", help="TF SavedModel directory")
    src.add_argument(
        "--npz", help="name->array .npz with reference variable names "
        "(no TF needed)",
    )
    p.add_argument("--family", required=True, choices=sorted(FAMILIES))
    p.add_argument("--out", required=True)
    p.add_argument(
        "--num_filters", type=int, default=None,
        help="destination model width override (else family default)",
    )
    args = p.parse_args(argv)

    if args.npz:
        with np.load(args.npz) as z:
            ref_vars = {k: z[k] for k in z.files}
    else:
        ref_vars = load_reference_variables(args.saved_model)
    overrides = (
        {"num_filters": args.num_filters} if args.num_filters else {}
    )
    template = make_template(args.family, **overrides)
    params = convert(ref_vars, args.family, template=template)

    from compression_tpu.models.common import save_checkpoint

    # `params` is the full model.init-shaped tree; save_checkpoint wraps it
    # in the same {"params": ..., "step": ...} envelope the CLI loaders read.
    save_checkpoint(args.out, params, step=0)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
