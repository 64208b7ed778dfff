"""LPIPS weight conversion: synthetic torch-layout weights -> flax params
(round-1 verdict #9: the converter must be testable without torch)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from tools.convert_lpips import (  # noqa: E402
    TORCH_CONV_IDX,
    convert_from_state_dicts,
)


def _synthetic_states(seed=0):
    """Torch-layout VGG16 + LPIPS-head state dicts with correct shapes."""
    from compression_tpu.models.hific.lpips import _BLOCKS

    rng = np.random.RandomState(seed)
    vgg = {}
    cin = 3
    flat = [(w,) for widths in _BLOCKS for w in widths]
    for (w,), ti in zip(flat, TORCH_CONV_IDX):
        vgg[f"features.{ti}.weight"] = rng.randn(w, cin, 3, 3).astype(
            np.float32
        ) * 0.05
        vgg[f"features.{ti}.bias"] = rng.randn(w).astype(np.float32) * 0.01
        cin = w
    lins = {}
    taps = [widths[-1] for widths in _BLOCKS]
    for i, c in enumerate(taps):
        lins[f"lin{i}.model.1.weight"] = np.abs(
            rng.randn(1, c, 1, 1).astype(np.float32)
        )
    return vgg, lins


def test_convert_and_evaluate(tmp_path, monkeypatch):
    vgg, lins = _synthetic_states()
    params = convert_from_state_dicts(vgg, lins)
    # Spot-check the layout transpose: torch (out, in, kh, kw) -> flax
    # (kh, kw, in, out).
    w0 = vgg["features.0.weight"]
    np.testing.assert_array_equal(
        params["params"]["vgg"]["conv0_0"]["kernel"],
        np.transpose(w0, (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        params["params"]["lin3"], lins["lin3.model.1.weight"].reshape(-1)
    )

    # Write + reload through the product path (TPC_LPIPS_WEIGHTS).
    from tools.convert_lpips import write_params

    out = tmp_path / "lpips_vgg16.msgpack"
    write_params(params, str(out))
    monkeypatch.setenv("TPC_LPIPS_WEIGHTS", str(out))
    from compression_tpu.models.hific.lpips import make_lpips

    model, loaded = make_lpips(64)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["lin3"]),
        lins["lin3.model.1.weight"].reshape(-1),
    )
    a = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    b = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    d_same = float(model.apply(loaded, a, a)[0])
    d_diff = float(model.apply(loaded, a, b)[0])
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert d_diff > 1e-4


def test_partial_weights_raise():
    vgg, lins = _synthetic_states()
    vgg.pop("features.28.weight")
    with pytest.raises(KeyError):
        convert_from_state_dicts(vgg, lins)
    vgg, lins = _synthetic_states()
    lins["lin2.model.1.weight"] = lins["lin2.model.1.weight"][:, :7]
    with pytest.raises(ValueError):
        convert_from_state_dicts(vgg, lins)
