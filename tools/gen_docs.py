"""API documentation generator (role of the reference's docs/ tree).

Walks the public API and writes markdown reference pages to docs/api/
from the live docstrings — run after API changes:

  python tools/gen_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

MODULES = [
    "compression_tpu",
    "compression_tpu.ops.math_ops",
    "compression_tpu.ops.round_ops",
    "compression_tpu.ops.padding_ops",
    "compression_tpu.distributions.base",
    "compression_tpu.distributions.deep_factorized",
    "compression_tpu.distributions.uniform_noise",
    "compression_tpu.distributions.round_adapters",
    "compression_tpu.distributions.helpers",
    "compression_tpu.codec.host",
    "compression_tpu.codec.jax_ops",
    "compression_tpu.codec.rans",
    "compression_tpu.codec.rans_ref",
    "compression_tpu.layers.signal_conv",
    "compression_tpu.layers.gdn",
    "compression_tpu.layers.parameters",
    "compression_tpu.entropy_models.continuous_base",
    "compression_tpu.entropy_models.continuous_batched",
    "compression_tpu.entropy_models.continuous_indexed",
    "compression_tpu.entropy_models.universal",
    "compression_tpu.entropy_models.power_law",
    "compression_tpu.util.packed_tensors",
    "compression_tpu.util.image",
    "compression_tpu.parallel.data_parallel",
    "compression_tpu.parallel.pipeline",
    "compression_tpu.parallel.spatial",
    "compression_tpu.parallel.charm_pipeline",
    "compression_tpu.parallel.charm_sharded",
    "compression_tpu.models.bls2017",
    "compression_tpu.models.bmshj2018",
    "compression_tpu.models.mbt2018",
    "compression_tpu.models.ms2020",
    "compression_tpu.models.device_coding",
    "compression_tpu.models.b2018",
    "compression_tpu.models.toy_sources",
    "compression_tpu.models.hific.model",
    "compression_tpu.cli.registry",
]


def document(mod_name: str) -> str:
    mod = importlib.import_module(mod_name)
    out = [f"# `{mod_name}`", "", inspect.getdoc(mod) or "", ""]
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in dir(mod) if not n.startswith("_")]
    for name in names:
        obj = getattr(mod, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        kind = "class" if inspect.isclass(obj) else "function" if callable(obj) else "const"
        out.append(f"## {kind} `{name}`")
        try:
            sig = str(inspect.signature(obj)) if callable(obj) else ""
        except (TypeError, ValueError):
            sig = ""
        if sig:
            out.append(f"```python\n{name}{sig}\n```")
        doc = inspect.getdoc(obj)
        if doc:
            out.append(doc)
        out.append("")
    return "\n".join(out)


def main() -> int:
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "api")
    os.makedirs(root, exist_ok=True)
    index = ["# compression_tpu API reference", ""]
    for mod_name in MODULES:
        page = document(mod_name)
        fname = mod_name.replace(".", "_") + ".md"
        with open(os.path.join(root, fname), "w") as f:
            f.write(page)
        index.append(f"- [{mod_name}]({fname})")
    with open(os.path.join(root, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES) + 1} pages to {root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
