"""Reference checkpoint converter: TFC SavedModel/metagraph -> our params.

Required for the bit-exactness milestone (SURVEY.md §5 checkpoint row):
ingests a trained reference model's weights and emits a msgpack param file
for the matching compression_tpu model, converting *effective* weights
(reference GDN beta/gamma are stored sqrt-reparameterized and conv kernels
possibly RDFT-reparameterized — we read the effective values through TF and
re-reparameterize into this framework's storage space; SURVEY.md §7 hard
part 6).

Offline tool: needs TensorFlow (present in this image) and a reference
checkpoint on disk. With the reference mount empty this cannot run here —
the mapping tables below are written against the upstream layer layout and
marked for re-verification once a checkpoint is available.

Usage:
  python tools/convert_reference.py --saved_model /path/to/sm \
      --family bls2017 --out ~/.cache/compression_tpu/bls2017.msgpack
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_reference_variables(saved_model_dir: str) -> dict:
    """Loads variable name -> np.ndarray from a TF SavedModel."""
    import tensorflow as tf  # local import: offline tool only

    loaded = tf.saved_model.load(saved_model_dir)
    out = {}
    for v in loaded.variables:
        out[v.name] = v.numpy()
    return out


def _conv_kernel_to_ours(k: np.ndarray) -> np.ndarray:
    """TF SignalConv kernels are (kh, kw, cin, cout) — same layout here."""
    return np.asarray(k)


def _gdn_to_ours(beta_eff: np.ndarray, gamma_eff: np.ndarray):
    """Effective GDN params -> our sqrt storage space."""
    sys.path.insert(0, ".")
    from compression_tpu.layers.parameters import nonneg_init

    return (
        np.asarray(nonneg_init(beta_eff)),
        np.asarray(nonneg_init(gamma_eff)),
    )


def convert_bls2017(ref_vars: dict) -> dict:
    """Maps reference bls2017 variables into our param pytree.

    Mapping (upstream models/bls2017.py layer names — re-verify against the
    actual checkpoint's variable names before relying on this):
      analysis_transform/layer_{i}/kernel, bias
      analysis_transform/layer_{i}/gdn_{i}/(beta|gamma)
      synthesis mirrors; entropy_model prior variables map to
      DeepFactorizedPrior's matrices/biases/factors.
    """
    params: dict = {"params": {"analysis": {}, "synthesis": {}, "prior": {}}}

    def find(substr):
        hits = [k for k in ref_vars if substr in k]
        if not hits:
            raise KeyError(
                f"no reference variable matches {substr!r}; have "
                f"{sorted(ref_vars)[:20]}..."
            )
        return ref_vars[hits[0]]

    for i in range(3):
        conv = {"kernel": _conv_kernel_to_ours(find(f"analysis_transform/layer_{i}/kernel"))}
        try:
            conv["bias"] = np.asarray(find(f"analysis_transform/layer_{i}/bias"))
        except KeyError:
            pass
        params["params"]["analysis"][f"conv{i}"] = conv
        if i < 2:
            beta, gamma = _gdn_to_ours(
                find(f"analysis_transform/layer_{i}/gdn"),
                find(f"analysis_transform/layer_{i}/gamma"),
            )
            params["params"]["analysis"][f"gdn{i}"] = {
                "beta": beta, "gamma": gamma,
            }
    # Synthesis + prior mapping follow the same pattern; completed once a
    # real checkpoint pins the exact variable names (mount currently empty).
    return params


FAMILIES = {"bls2017": convert_bls2017}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--saved_model", required=True)
    p.add_argument("--family", required=True, choices=sorted(FAMILIES))
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    ref_vars = load_reference_variables(args.saved_model)
    params = FAMILIES[args.family](ref_vars)

    from flax import serialization

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes({"params": params, "step": 0}))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
