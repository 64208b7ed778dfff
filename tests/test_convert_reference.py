"""Reference-checkpoint converter: schema round trip for every family.

The reference mount is empty (SURVEY.md provenance note), so these tests
exercise the converter against synthetically-built reference variables in
the documented upstream name schema (tools/make_reference_savedmodel.py):
template -> reference names -> convert() must be the identity, partial
inputs must RAISE (round-1 verdict: silent partials are forbidden).
"""

import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, "/root/repo")

from tools.convert_reference import FAMILIES, convert, make_template  # noqa: E402
from tools.make_reference_savedmodel import (  # noqa: E402
    template_to_reference_names,
)

pytestmark = pytest.mark.slow  # multi-minute: virtual-mesh compiles / model-scale jits


def _template(family):
    if family == "hific":
        return make_template(
            family, num_latents=8, num_hyperlatents=4, num_residual_blocks=2
        )
    return make_template(
        family, num_filters=8,
        **({"num_latents": 8, "num_hyperlatents": 4}
           if family != "bls2017" else {}),
    )


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_roundtrip_identity(family):
    kwargs = {}
    if family == "ms2020":
        tmpl = make_template(
            family, num_filters=8, num_latents=8, num_hyperlatents=4,
            num_slices=4,
        )
        kwargs["num_slices"] = 4
    elif family == "hific":
        tmpl = _template(family)
        kwargs["num_residual_blocks"] = 2
    else:
        tmpl = _template(family)
    named = template_to_reference_names(tmpl, family)
    # Simulate real checkpoint noise: ':0' suffixes and a scope prefix.
    ref_vars = {f"model/{k}:0": v for k, v in named.items()}
    out = convert(ref_vars, family, template=tmpl, **kwargs)
    t_leaves = jax.tree_util.tree_leaves(tmpl)
    o_leaves = jax.tree_util.tree_leaves(out)
    assert len(t_leaves) == len(o_leaves)
    for a, b in zip(t_leaves, o_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )
    # Structure identical too (flax serialization round trip).
    from flax import serialization

    blob = serialization.to_bytes(out)
    back = serialization.from_bytes(tmpl, blob)
    for a, b in zip(
        jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(tmpl)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_partial_mapping_raises():
    tmpl = _template("bls2017")
    named = template_to_reference_names(tmpl, "bls2017")
    # Drop one weight: the converter must refuse, not emit garbage.
    key = sorted(named)[0]
    partial = {k: v for k, v in named.items() if k != key}
    with pytest.raises((KeyError, ValueError)):
        convert(partial, "bls2017", template=tmpl)


def test_unconsumed_reference_weight_raises():
    tmpl = _template("bls2017")
    named = template_to_reference_names(tmpl, "bls2017")
    named["mystery/extra_weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="never.*consumed|consumed"):
        convert(named, "bls2017", template=tmpl)


def test_gdn_reparam_inversion():
    """Reference reparam storage -> effective -> our storage is value-exact
    (both frameworks store sqrt(value + 2^-36))."""
    from tools.convert_reference import _gdn_effective, _gdn_to_ours

    eff = np.asarray([0.0, 1e-6, 0.1, 1.0, 7.5], np.float64)
    stored_ref = np.sqrt(eff + (2.0 ** -18) ** 2)  # TFC GDNParameter storage
    ours = _gdn_to_ours(_gdn_effective(stored_ref))
    np.testing.assert_allclose(ours, stored_ref.astype(np.float32), rtol=1e-6)


def test_rdft_kernel_inversion():
    """RDFT-parameterized reference kernels invert through the orthonormal
    basis back to the effective kernel."""
    from compression_tpu.layers.parameters import rdft_basis
    from tools.convert_reference import RdftKernel

    rng = np.random.RandomState(0)
    kh, kw, cin, cout = 5, 5, 3, 4
    kernel = rng.randn(kh, kw, cin, cout)
    basis = rdft_basis(kh * kw)
    coeffs = (basis @ kernel.reshape(kh * kw, -1)).reshape(
        kh * kw, cin, cout
    )
    back = RdftKernel("k", coeffs).resolve((kh, kw, cin, cout))
    np.testing.assert_allclose(back, kernel.astype(np.float32), atol=1e-5)
