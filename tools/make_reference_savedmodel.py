"""Builds a TF SavedModel (and .npz) with REFERENCE-shaped variable names.

The reference mount is empty (SURVEY.md provenance note), so the converter
cannot be exercised against a real TFC checkpoint. This tool makes the
converter dry-runnable end-to-end regardless: it takes one of OUR model
templates (fresh init or a trained msgpack), renames every leaf into the
upstream tensorflow/compression variable-name schema that
tools/convert_reference.py expects (reference: models/bls2017.py,
models/bmshj2018.py, models/ms2020.py layer names), and writes a TF
SavedModel plus a plain .npz with those names. GDN parameters are written
in TFC's reparam storage space (identical to ours: sqrt(value + 2^-36)),
prior matrices/biases/factors raw — so
``convert(load(saved))`` must reproduce the source template bit-exactly,
which is exactly what tests/test_convert_reference.py asserts.

Usage:
  python tools/make_reference_savedmodel.py --family bmshj2018 \
      --out /tmp/ref_sm [--num_filters 8] [--ckpt trained.msgpack]
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict

import numpy as np

# our-template keystr pattern -> reference name template. Applied in order;
# {N} groups are substituted from the match.
_COMMON_RULES = [
    (r"\['analysis'\]\['conv(\d+)'\]\['kernel'\]", r"analysis/layer_\1/kernel"),
    (r"\['analysis'\]\['conv(\d+)'\]\['bias'\]", r"analysis/layer_\1/bias"),
    (r"\['analysis'\]\['gdn(\d+)'\]\['beta'\]",
     r"analysis/layer_\1/gdn_\1/reparam_beta"),
    (r"\['analysis'\]\['gdn(\d+)'\]\['gamma'\]",
     r"analysis/layer_\1/gdn_\1/reparam_gamma"),
    (r"\['synthesis'\]\['conv(\d+)'\]\['kernel'\]", r"synthesis/layer_\1/kernel"),
    (r"\['synthesis'\]\['conv(\d+)'\]\['bias'\]", r"synthesis/layer_\1/bias"),
    (r"\['synthesis'\]\['igdn(\d+)'\]\['beta'\]",
     r"synthesis/layer_\1/igdn_\1/reparam_beta"),
    (r"\['synthesis'\]\['igdn(\d+)'\]\['gamma'\]",
     r"synthesis/layer_\1/igdn_\1/reparam_gamma"),
    (r"\['hyper_analysis'\]\['conv(\d+)'\]\['kernel'\]",
     r"hyper_analysis/layer_\1/kernel"),
    (r"\['hyper_analysis'\]\['conv(\d+)'\]\['bias'\]",
     r"hyper_analysis/layer_\1/bias"),
    (r"\['hyper_synthesis'\]\['conv(\d+)'\]\['kernel'\]",
     r"hyper_synthesis/layer_\1/kernel"),
    (r"\['hyper_synthesis'\]\['conv(\d+)'\]\['bias'\]",
     r"hyper_synthesis/layer_\1/bias"),
    # DeepFactorized prior: flatten order of the dataclass pytree is
    # (matrices, biases, factors).
    (r"\['(?:prior|hyperprior)'\]\['deep_factorized'\]\[<flat index 0>\]\[(\d+)\]",
     r"entropy_model/matrix_\1"),
    (r"\['(?:prior|hyperprior)'\]\['deep_factorized'\]\[<flat index 1>\]\[(\d+)\]",
     r"entropy_model/bias_\1"),
    (r"\['(?:prior|hyperprior)'\]\['deep_factorized'\]\[<flat index 2>\]\[(\d+)\]",
     r"entropy_model/factor_\1"),
]

_MS2020_RULES = [
    (r"\['mean_support'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"hyper_synthesis_mean/layer_\1/\2"),
    (r"\['scale_support'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"hyper_synthesis_scale/layer_\1/\2"),
    (r"\['mean_t(\d+)'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"cc_mean_\1/layer_\2/\3"),
    (r"\['scale_t(\d+)'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"cc_scale_\1/layer_\2/\3"),
    (r"\['lrp_t(\d+)'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"lrp_\1/layer_\2/\3"),
]

_HIFIC_RULES = [
    (r"\['encoder'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"encoder/layer_\1/\2"),
    (r"\['encoder'\]\['conv_out'\]\['(kernel|bias)'\]",
     r"encoder/layer_out/\1"),
    (r"\['encoder'\]\['norm(\d+)'\]\['(gamma|beta)'\]",
     r"encoder/norm_\1/\2"),
    (r"\['generator'\]\['conv_in'\]\['(kernel|bias)'\]",
     r"generator/layer_in/\1"),
    (r"\['generator'\]\['conv_out'\]\['(kernel|bias)'\]",
     r"generator/layer_out/\1"),
    (r"\['generator'\]\['norm_(in|head)'\]\['(gamma|beta)'\]",
     r"generator/norm_\1/\2"),
    (r"\['generator'\]\['res(\d+)'\]\['conv(\d+)'\]\['(kernel|bias)'\]",
     r"generator/res_\1/conv_\2/\3"),
    (r"\['generator'\]\['res(\d+)'\]\['norm(\d+)'\]\['(gamma|beta)'\]",
     r"generator/res_\1/norm_\2/\3"),
    (r"\['generator'\]\['up(\d+)'\]\['(kernel|bias)'\]",
     r"generator/up_\1/\2"),
    (r"\['generator'\]\['upnorm(\d+)'\]\['(gamma|beta)'\]",
     r"generator/upnorm_\1/\2"),
]

RULES = {
    "bls2017": _COMMON_RULES,
    "bmshj2018": _COMMON_RULES,
    "bmshj2018_factorized": _COMMON_RULES,
    "mbt2018": _COMMON_RULES,
    "ms2020": _COMMON_RULES + _MS2020_RULES,
    "hific": _COMMON_RULES + _HIFIC_RULES,
}


def template_to_reference_names(template, family: str) -> Dict[str, np.ndarray]:
    """Flattens one of our param pytrees into reference-named arrays."""
    import jax

    out: Dict[str, np.ndarray] = {}
    unmatched = []
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    rules = RULES[family]
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        for pat, repl in rules:
            m = re.search(pat, key)
            if m:
                name = m.expand(repl)
                if name in out:
                    raise ValueError(f"duplicate reference name {name}")
                out[name] = np.asarray(leaf)
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise ValueError(
            f"{family}: no reference-name rule for {len(unmatched)} "
            f"template leaves: {unmatched[:8]}"
        )
    return out


def save_tf_savedmodel(named: Dict[str, np.ndarray], outdir: str) -> None:
    import tensorflow as tf

    module = tf.Module()
    module.all_variables = [
        tf.Variable(v, name=k, trainable=False) for k, v in named.items()
    ]
    tf.saved_model.save(module, outdir)


def main(argv=None) -> int:
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", required=True, choices=sorted(RULES))
    p.add_argument("--out", required=True, help="SavedModel dir (also .npz)")
    p.add_argument("--num_filters", type=int, default=None)
    p.add_argument("--ckpt", default=None, help="msgpack to export "
                   "(default: fresh init template)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from tools.convert_reference import make_template

    overrides = {"num_filters": args.num_filters} if args.num_filters else {}
    template = make_template(args.family, **overrides)
    if args.ckpt:
        from compression_tpu.models.common import load_checkpoint

        template, _ = load_checkpoint(args.ckpt, template)
    named = template_to_reference_names(template, args.family)
    np.savez(args.out.rstrip("/") + ".npz", **named)
    save_tf_savedmodel(named, args.out)
    print(f"wrote {args.out} (SavedModel) and {args.out}.npz "
          f"({len(named)} variables)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
