"""Round-orchestration tooling: checkpoint promotion + cache fingerprint.

tools/promote_train_ckpt.py salvages deadline-killed training runs by
promoting the periodic ``<model>.train.msgpack`` (which carries optimizer
state) to the eval checkpoint name that ``cli/registry.resolve`` loads.
util/cache.host_fingerprint keys the persistent XLA cache; CPU-platform
processes add the CPU model name (stale-AOT SIGILL guard) while the
default stays byte-stable so existing TPU cache dirs keep resolving.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compression_tpu.models.common import load_checkpoint, save_checkpoint
from compression_tpu.util.cache import host_fingerprint
from tools.promote_train_ckpt import promote


@pytest.fixture()
def model_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("TPC_MODEL_DIR", str(tmp_path))
    return tmp_path


def _params():
    rng = np.random.RandomState(0)
    return {
        "analysis": {"kernel": rng.randn(3, 3, 2, 4).astype(np.float32)},
        "prior": {"logits": rng.randn(4, 7).astype(np.float32)},
    }


def test_promote_strips_opt_state_and_preserves_params(model_dir):
    params = _params()
    opt_state = {"m": {"analysis": {"kernel": np.zeros((3, 3, 2, 4), np.float32)}}}
    src = model_dir / "bls2017.train.msgpack"
    save_checkpoint(str(src), params, step=123, opt_state=opt_state)

    assert promote("bls2017")
    dst = model_dir / "bls2017.msgpack"
    assert dst.exists()
    # The promoted blob must load through the params-only template path
    # (what cli/tfci eval uses) with identical values and the right step.
    template = {k: {kk: np.zeros_like(vv) for kk, vv in v.items()}
                for k, v in params.items()}
    loaded, step = load_checkpoint(str(dst), template)
    assert step == 123
    np.testing.assert_array_equal(
        loaded["analysis"]["kernel"], params["analysis"]["kernel"]
    )
    np.testing.assert_array_equal(
        loaded["prior"]["logits"], params["prior"]["logits"]
    )


def test_promote_is_noop_when_eval_ckpt_current(model_dir):
    params = _params()
    src = model_dir / "bls2017.train.msgpack"
    save_checkpoint(str(src), params, step=10, opt_state={"m": 1})
    assert promote("bls2017")
    # Second promote: eval ckpt is now newer -> refuses without --force.
    assert not promote("bls2017")
    assert promote("bls2017", force=True)


def test_promote_without_training_ckpt_is_clean_no(model_dir):
    assert not promote("bmshj2018")


def test_host_fingerprint_platform_scoping():
    base = host_fingerprint()
    strict = host_fingerprint(include_model=True)
    # Stable across calls (cache-dir identity must not jitter).
    assert base == host_fingerprint()
    assert strict == host_fingerprint(include_model=True)
    assert len(base) == 12 and len(strict) == 12
    # On hosts exposing a cpuinfo model name the strict key must differ
    # (that difference IS the stale-AOT guard).
    with open("/proc/cpuinfo") as f:
        has_model = any(line.startswith("model name") for line in f)
    if has_model:
        assert base != strict


def test_synthetic_set_train_seeds_never_touch_eval_block():
    """The dataset generator's train/eval split is seed-disjoint.

    Round 3's headline regression came from training data silently
    overlapping in *content* with what the models had memorized; this
    pins the stronger invariant the generator documents: for ANY train
    set size, train seeds skip the whole 96..111 guard block, so the
    frozen eval seeds (100..103) can never be trained on.
    """
    from tools.make_synthetic_set import main as _  # import check only

    def train_seed(i):
        return i if i < 96 else i + 16

    seeds = {train_seed(i) for i in range(10_000)}
    assert seeds.isdisjoint(range(96, 112))
    assert len(seeds) == 10_000  # injective: no duplicate train images


def test_synthetic_set_is_seed_stable():
    """Same seed -> byte-identical image (rows stay comparable across
    regenerations; the R-D tables in results/synthetic/ depend on it)."""
    from tools.make_synthetic_set import make

    a = make(64, 48, seed=100)
    b = make(64, 48, seed=100)
    c = make(64, 48, seed=101)
    assert a.dtype == np.uint8 and a.shape == (64, 48, 3)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_bench_checkpoint_preference_order(tmp_path, monkeypatch):
    """bench.py measures: product cache ckpt > repo-committed fallback >
    quick-train path. The fallback exists because VM rebuilds wipe the
    model cache and the driver's round-end bench must still see a trained
    codec's symbol statistics."""
    import bench

    monkeypatch.setenv("TPC_MODEL_DIR", str(tmp_path / "nothing_here"))
    repo_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)),
        "ckpt", "bmshj2018.msgpack",
    )
    expected = (
        repo_ckpt if os.path.exists(repo_ckpt) else "/tmp/tpc_bench_ckpt.msgpack"
    )
    assert bench.pick_checkpoint(False) == expected

    (tmp_path / "cache").mkdir()
    product = tmp_path / "cache" / "bmshj2018.msgpack"
    product.write_bytes(b"x")
    monkeypatch.setenv("TPC_MODEL_DIR", str(tmp_path / "cache"))
    assert bench.pick_checkpoint(False) == str(product)
    assert bench.pick_checkpoint(True).endswith("tiny.msgpack")


def test_rd_report_bd_psnr_recovers_known_offset(tmp_path):
    """Two synthetic curves offset by exactly 1.5 dB at every rate must
    report BD-PSNR = +1.5; single-point families report no pair."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.rd_report import bd_psnr, collect, read_mean_row

    def write(stem, rows):
        p = tmp_path / f"{stem}.csv"
        lines = ["image,bpp,psnr,msssim"]
        for i, (bpp, psnr) in enumerate(rows):
            lines.append(f"{i}.png,{bpp},{psnr},0.9")
        mb = np.mean([r[0] for r in rows])
        mp = np.mean([r[1] for r in rows])
        lines.append(f"mean,{mb},{mp},0.9")
        p.write_text("\n".join(lines) + "\n")

    # Family curves as separate csvs (one mean point each).
    for q, bpp in enumerate((0.1, 0.2, 0.4, 0.8), 1):
        psnr = 20 + 5 * np.log10(bpp / 0.1)
        write(f"ms2020-q{q}", [(bpp, psnr + 1.5)])
        write(f"mbt2018-q{q}", [(bpp, psnr)])
    fams = collect(str(tmp_path))
    assert len(fams["ms2020"]) == 4 and len(fams["mbt2018"]) == 4
    d = bd_psnr(fams["ms2020"], fams["mbt2018"])
    assert abs(d - 1.5) < 1e-6
    # Parser sanity.
    bpp, psnr, ms = read_mean_row(str(tmp_path / "ms2020-q1.csv"))
    assert abs(bpp - 0.1) < 1e-9 and ms == 0.9


def test_rd_report_curve_hygiene(tmp_path):
    """msssim-trained rows form their own family, factorized is not on
    the hyperprior curve, genseen/genfresh/96px rows are table-only, and
    a CURVES.json manifest pins the canonical (matched-budget) stems."""
    import json as _json
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.rd_report import collect, curve_points, family_of

    assert family_of("ms2020-msssim-q5") == "ms2020-msssim"
    assert family_of("bmshj2018-factorized-q3") == "bmshj2018-factorized"
    assert family_of("bmshj2018-q3") == "bmshj2018"
    assert family_of("mbt2018-long") == "mbt2018"

    def write(stem, bpp, psnr):
        (tmp_path / f"{stem}.csv").write_text(
            "image,bpp,psnr,msssim\n"
            f"0.png,{bpp},{psnr},0.9\nmean,{bpp},{psnr},0.9\n"
        )

    write("ms2020", 0.09, 37.0)
    write("ms2020-q5", 0.10, 37.1)
    write("ms2020-genseen", 0.12, 35.5)   # seen-image probe: table-only
    write("ms2020-msssim-q5", 0.14, 16.4) # own family, never on PSNR curve
    write("mbt2018", 0.20, 30.9)          # short-budget row
    write("mbt2018-long", 0.12, 35.8)
    write("mbt2018-q1-long", 0.08, 34.0)
    fams = collect(str(tmp_path))
    assert [p[3] for p in fams["ms2020-msssim"]] == ["ms2020-msssim-q5"]

    # No manifest: all eligible points (table-only rows still excluded).
    pts, canonical = curve_points(fams, "ms2020", {})
    assert not canonical and [p[3] for p in pts] == ["ms2020", "ms2020-q5"]

    # Manifest pins matched-budget stems; the 10k mbt2018 row drops out.
    manifest = {"mbt2018": ["mbt2018-long", "mbt2018-q1-long"]}
    pts, canonical = curve_points(fams, "mbt2018", manifest)
    assert canonical and [p[3] for p in pts] == ["mbt2018-q1-long", "mbt2018-long"]

    # A manifest naming <2 present stems falls back to every eligible row.
    pts, canonical = curve_points(fams, "mbt2018", {"mbt2018": ["absent"]})
    assert not canonical and len(pts) == 3
