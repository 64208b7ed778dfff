"""LPIPS weight converter: torch `lpips` package / VGG16 -> flax msgpack.

Produces ``lpips_vgg16.msgpack`` for compression_tpu.models.hific.lpips
(the role of the reference's frozen-LPIPS download, reference:
models/hific/helpers.py `ensure_lpips_weights`).

Two input forms:
* torch checkpoints (`--vgg16 vgg16.pth --lins lpips_vgg.pth`) — the
  public LPIPS v0.1 layout (torchvision VGG16 `features.N.weight` +
  `linN.model.1.weight` heads); needs torch.
* raw-numpy `.npz` files with the SAME key layout (`--vgg16-npz /
  --lins-npz`) — no torch required, so the mapping itself is unit-testable
  in this sandbox (round-1 verdict #9) and weights can be shipped from any
  environment that can read the torch files once.

Usage:
  python tools/convert_lpips.py --vgg16 vgg16.pth --lins lpips_vgg.pth \
      --out ~/.cache/compression_tpu/lpips_vgg16.msgpack
  python tools/convert_lpips.py --vgg16-npz vgg16.npz --lins-npz lins.npz \
      --out ...
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, Mapping

import numpy as np

# torchvision VGG16 `features` Sequential conv indices (pools/relus between):
# blocks (64,64) (128,128) (256,256,256) (512,512,512) (512,512,512).
TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_from_state_dicts(
    vgg_state: Mapping[str, np.ndarray],
    lin_state: Mapping[str, np.ndarray],
) -> Dict:
    """Maps torch-layout state dicts (as numpy) to our LPIPS param pytree.

    Raises KeyError/ValueError on any missing or mis-shaped weight — a
    partial conversion must never be written out.
    """
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from compression_tpu.models.hific.lpips import LPIPS, _BLOCKS

    model = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), x, x)
    )

    flat = [(b, c) for b, widths in enumerate(_BLOCKS)
            for c, _ in enumerate(widths)]
    if len(flat) != len(TORCH_CONV_IDX):
        raise ValueError("VGG16 block table out of sync with torch indices")
    for (b, c), ti in zip(flat, TORCH_CONV_IDX):
        w = np.asarray(vgg_state[f"features.{ti}.weight"])  # (out, in, kh, kw)
        bias = np.asarray(vgg_state[f"features.{ti}.bias"])
        dst = params["params"]["vgg"][f"conv{b}_{c}"]
        kernel = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        if kernel.shape != dst["kernel"].shape:
            raise ValueError(
                f"conv{b}_{c}: torch weight {w.shape} -> {kernel.shape} "
                f"!= expected {dst['kernel'].shape}"
            )
        params["params"]["vgg"][f"conv{b}_{c}"] = {
            "kernel": kernel,
            "bias": bias.astype(np.float32),
        }

    # LPIPS linear heads: lin{i}.model.1.weight, shape (1, C, 1, 1).
    for i in range(5):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"]).reshape(-1)
        if w.shape != params["params"][f"lin{i}"].shape:
            raise ValueError(
                f"lin{i}: got {w.shape}, expected "
                f"{params['params'][f'lin{i}'].shape}"
            )
        params["params"][f"lin{i}"] = w.astype(np.float32)
    return params


def convert(vgg16_path: str, lins_path: str, out_path: str) -> None:
    import torch

    vgg_state = {
        k: v.numpy()
        for k, v in torch.load(vgg16_path, map_location="cpu").items()
    }
    lin_state = {
        k: v.numpy()
        for k, v in torch.load(lins_path, map_location="cpu").items()
    }
    write_params(convert_from_state_dicts(vgg_state, lin_state), out_path)


def convert_npz(vgg16_npz: str, lins_npz: str, out_path: str) -> None:
    with np.load(vgg16_npz) as z:
        vgg_state = {k: z[k] for k in z.files}
    with np.load(lins_npz) as z:
        lin_state = {k: z[k] for k in z.files}
    write_params(convert_from_state_dicts(vgg_state, lin_state), out_path)


def write_params(params: Dict, out_path: str) -> None:
    from flax import serialization

    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vgg16", help="torchvision VGG16 .pth state dict")
    p.add_argument("--lins", help="lpips package vgg.pth linear heads")
    p.add_argument("--vgg16-npz", help=".npz with torch-layout VGG16 keys")
    p.add_argument("--lins-npz", help=".npz with torch-layout lin heads")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.vgg16_npz and args.lins_npz:
        convert_npz(args.vgg16_npz, args.lins_npz, args.out)
    elif args.vgg16 and args.lins:
        convert(args.vgg16, args.lins, args.out)
    else:
        p.error("need --vgg16 + --lins (torch) or --vgg16-npz + --lins-npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
