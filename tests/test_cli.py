"""CLI end-to-end tests: every tfci verb through main(), tiny models on CPU.

Drives the same surface a user does (train -> compress -> decompress ->
dump -> eval -> models), with TPC_TINY_MODELS shrinking the registry
configs so the whole cycle runs in seconds.
"""

import os

import numpy as np
import pytest

from compression_tpu.util import image as image_util


@pytest.fixture()
def cli_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TPC_TINY_MODELS", "1")
    monkeypatch.setenv("TPC_MODEL_DIR", str(tmp_path / "models"))
    monkeypatch.delenv("TPC_TABLE_CACHE_FILE", raising=False)
    # Structured test image.
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [xx / w * 255, yy / h * 255, ((xx + yy) % 64) * 4], -1
    ).astype(np.uint8)
    png = str(tmp_path / "in.png")
    image_util.write_png(png, img)
    return tmp_path, png, img


def _main(argv):
    from compression_tpu.cli.tfci import main

    return main(argv)


def test_models_verb(capsys):
    assert _main(["models"]) == 0
    out = capsys.readouterr().out
    for name in ("bls2017", "bmshj2018-hyperprior", "ms2020-cc10", "hific-lo"):
        assert name in out


def test_full_cycle_bls2017(cli_env, capsys):
    tmp_path, png, img = cli_env
    assert _main([
        "train", "bls2017", "--steps", "3", "--batch-size", "2",
        "--patch-size", "32",
    ]) == 0
    tfci = str(tmp_path / "out.tfci")
    out_png = str(tmp_path / "out.png")
    assert _main(["compress", "bls2017", png, tfci]) == 0
    assert os.path.getsize(tfci) > 0
    assert _main(["decompress", tfci, out_png]) == 0
    recon = image_util.read_png(out_png)
    assert recon.shape == img.shape

    npz_path = str(tmp_path / "dump.npz")
    assert _main(["dump", tfci, "--output", npz_path]) == 0
    dump = capsys.readouterr().out
    assert "model: bls2017" in dump and "tensor 0" in dump
    # --output extracts the packed tensors verbatim (reference dump parity):
    # every non-MD feature appears, and the bitstream bytes round-trip.
    from compression_tpu.util import PackedTensors

    packed = PackedTensors(open(tfci, "rb").read())
    extracted = np.load(npz_path)
    assert str(extracted["model"]) == "bls2017"
    for key, kind, count, _size in packed.describe():
        if key == "MD":
            continue
        if kind == "bytes" and count == 1:
            assert (
                extracted[key].tobytes()
                == packed.unpack_one(int(key), object)[0]
            )
        elif kind != "bytes":
            np.testing.assert_array_equal(
                extracted[key],
                packed.unpack_one(
                    int(key), np.int64 if kind == "int64" else np.float32
                ),
            )

    csv = str(tmp_path / "rd.csv")
    assert _main(["eval", "bls2017", png, "--csv", csv]) == 0
    lines = open(csv).read().strip().splitlines()
    # Test image is 96px: too small for MS-SSIM; the eval verb reports
    # single-scale SSIM for the whole set and labels the column honestly.
    assert lines[0] == "image,bpp,psnr,ssim" and len(lines) == 3


def test_compress_requires_checkpoint(cli_env):
    tmp_path, png, _ = cli_env
    with pytest.raises(FileNotFoundError):
        _main(["compress", "mbt2018", png])


def test_unknown_model(cli_env):
    _, png, _ = cli_env
    with pytest.raises(KeyError):
        _main(["compress", "not-a-model", png])


def test_registry_propagates_requested_name():
    """The packed .tfci model name must equal the requested registry name,
    or alias/quality-suffixed encodes desync from their checkpoints on
    decode (advisor finding, round 1)."""
    from compression_tpu.cli import registry

    for name in (
        "bmshj2018",                      # alias != family default name
        "bmshj2018-hyperprior-mse-6",     # quality-suffixed
        "mbt2018",
        "ms2020-cc10-mse-3",
        "bls2017-factorized-mse",
    ):
        entry, _ = registry.resolve(name)
        assert entry.config.model_name == name, name
    # HiFiC packs config.name instead.
    entry, _ = registry.resolve("hific-lo")
    cfg = entry.make_model().config
    assert cfg.name == "hific-lo"


def test_bmshj2018_factorized_roundtrip(cli_env, monkeypatch):
    """The reference zoo's bmshj2018-factorized-* family: bmshj transforms
    with a factorized prior, no hyperprior (reference models/tfci.py model
    list). Round-trips through the bls2017 codec path."""
    import jax
    import numpy as np

    from compression_tpu.cli import registry

    entry, _ = registry.resolve("bmshj2018-factorized-mse-3")
    assert entry.config.model_name == "bmshj2018-factorized-mse-3"
    assert entry.config.arch == "bmshj2018"
    model = entry.make_model()
    img = (np.random.RandomState(0).rand(64, 48, 3) * 255).astype(np.uint8)
    x = np.zeros((1, 64, 48, 3), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), x, jax.random.PRNGKey(1), training=True
    )
    out = entry.decompress(model, params, entry.compress(model, params, img))
    assert out.shape == img.shape
    # The 192-filter b2018 variants resolve and stay variable-rate.
    entry, _ = registry.resolve("b2018-gdn-192-2")
    assert entry.config.model_name == "b2018-gdn-192-2"
    assert entry.config.quality == 2
    entry, _ = registry.resolve("b2018-leaky_relu-192-1")
    assert entry.config.activation == "leaky_relu"


def test_full_cycle_alias_name_roundtrip(cli_env):
    """Advisor repro: train via alias 'bmshj2018' -> compress -> decompress
    must resolve back to the same checkpoint (packed name == alias)."""
    tmp_path, png, img = cli_env
    assert _main([
        "train", "bmshj2018", "--steps", "2", "--batch-size", "2",
        "--patch-size", "64",
    ]) == 0
    tfci = str(tmp_path / "alias.tfci")
    out_png = str(tmp_path / "alias.png")
    assert _main(["compress", "bmshj2018", png, tfci]) == 0
    from compression_tpu.util import PackedTensors

    assert PackedTensors(open(tfci, "rb").read()).model == "bmshj2018"
    assert _main(["decompress", tfci, out_png]) == 0
    assert image_util.read_png(out_png).shape == img.shape


def test_spatial_flag_roundtrip(cli_env):
    """--spatial N: compress + decompress with the transforms H-sharded
    over an N-device mesh; the reconstruction matches the dense decode of
    the same spatial stream within uint8 rounding."""
    tmp_path, png, img = cli_env
    assert _main([
        "train", "bls2017", "--steps", "2", "--batch-size", "2",
        "--patch-size", "32",
    ]) == 0
    tfci = str(tmp_path / "sp.tfci")
    out_png = str(tmp_path / "sp.png")
    assert _main(["compress", "bls2017", png, tfci, "--spatial", "4"]) == 0
    assert _main(["decompress", tfci, out_png, "--spatial", "4"]) == 0
    recon = image_util.read_png(out_png)
    assert recon.shape == img.shape
    dense_png = str(tmp_path / "sp_dense.png")
    assert _main(["decompress", tfci, dense_png]) == 0
    dense = image_util.read_png(dense_png)
    np.testing.assert_allclose(
        recon.astype(np.int32), dense.astype(np.int32), atol=1
    )


def test_spatial_flag_rejects_unsupported_family(cli_env):
    import pytest as _pytest

    tmp_path, png, img = cli_env
    assert _main([
        "train", "b2018", "--steps", "2", "--batch-size", "2",
        "--patch-size", "32",
    ]) == 0
    with _pytest.raises(SystemExit, match="spatial"):
        _main([
            "compress", "b2018-gdn-128-2", png, str(tmp_path / "x.tfci"),
            "--spatial", "2",
        ])


def test_train_init_from_warm_start(cli_env):
    """--init-from transfers the source model's parameters (fine-tune
    path: -msssim variants start from their -mse twins; from-scratch
    msssim converges to a luminance-drifted solution, see
    tools/diag_ms2020_msssim.py)."""
    import jax
    import numpy as np
    from flax import serialization

    from compression_tpu.cli import registry

    assert _main([
        "train", "bls2017-factorized-mse-5", "--steps", "3",
        "--batch-size", "2", "--patch-size", "32",
    ]) == 0
    src = registry.checkpoint_path("bls2017-factorized-mse-5")
    src_tree = serialization.msgpack_restore(open(src, "rb").read())

    # 0-step fine-tune: params must equal the source exactly.
    assert _main([
        "train", "bls2017-factorized-msssim-5", "--steps", "0",
        "--batch-size", "2", "--patch-size", "32",
        "--init-from", "bls2017-factorized-mse-5",
    ]) == 0
    dst = registry.checkpoint_path("bls2017-factorized-msssim-5")
    dst_tree = serialization.msgpack_restore(open(dst, "rb").read())
    src_leaves = jax.tree.leaves(src_tree["params"])
    dst_leaves = jax.tree.leaves(dst_tree["params"])
    assert len(src_leaves) == len(dst_leaves)
    for a, b in zip(src_leaves, dst_leaves):
        np.testing.assert_array_equal(a, b)


def test_train_init_from_family_mismatch(cli_env):
    with pytest.raises(SystemExit):
        _main([
            "train", "mbt2018-mean-mse-5", "--steps", "1",
            "--batch-size", "2", "--patch-size", "32",
            "--init-from", "bls2017-factorized-mse-5",
        ])
