"""LPIPS weight converter: torch `lpips` package / VGG16 -> flax msgpack.

Produces ``lpips_vgg16.msgpack`` for compression_tpu.models.hific.lpips.
Offline tool: requires a torch LPIPS checkpoint (the `lpips` pip package's
vgg.pth + torchvision VGG16 weights). This sandbox has torch but no
network, so the tool is exercised end-to-end only where those weight files
exist; layer-name mapping below follows the public LPIPS v0.1 layout.

Usage:
  python tools/convert_lpips.py --vgg16 vgg16.pth --lins lpips_vgg.pth \
      --out ~/.cache/compression_tpu/lpips_vgg16.msgpack
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def convert(vgg16_path: str, lins_path: str, out_path: str) -> None:
    import torch

    import jax
    import jax.numpy as jnp
    from flax import serialization

    sys.path.insert(0, ".")
    from compression_tpu.models.hific.lpips import LPIPS, _BLOCKS

    vgg_state = torch.load(vgg16_path, map_location="cpu")
    lin_state = torch.load(lins_path, map_location="cpu")

    model = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), x, x)
    )

    # torchvision VGG16 features are a flat Sequential: conv indices
    # 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28.
    torch_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    flat = []
    for b, widths in enumerate(_BLOCKS):
        for c, _ in enumerate(widths):
            flat.append((b, c))
    assert len(flat) == len(torch_conv_idx)
    for (b, c), ti in zip(flat, torch_conv_idx):
        w = vgg_state[f"features.{ti}.weight"].numpy()  # (out, in, kh, kw)
        bias = vgg_state[f"features.{ti}.bias"].numpy()
        params["params"]["vgg"][f"conv{b}_{c}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": bias,
        }

    # LPIPS linear heads: lin{i}.model.1.weight (1, C, 1, 1).
    for i in range(5):
        w = lin_state[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        params["params"][f"lin{i}"] = w

    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vgg16", required=True)
    p.add_argument("--lins", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    convert(args.vgg16, args.lins, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
