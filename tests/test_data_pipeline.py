"""Input pipeline: crop sampling + dihedral augmentation.

The augmentation exists because of a measured failure: the mean-conditioned
models (mbt2018/ms2020) memorize small training sets — ms2020 coded its own
24 training images at 0.036 bpp / 35.9 dB but held-out images at 0.432 bpp /
17.9 dB (results/synthetic/README.md round-3 root-cause section). With
patch_size equal to the image size, crops were the identity, so each epoch
replayed the same fixed tensors; the 8-element flip/transpose orbit breaks
that exactly-constant replay. These tests pin the mechanism (orbit members
only, determinism, exact-opt-out) rather than the training outcome.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compression_tpu.models.common import TrainConfig, crop_dataset
from compression_tpu.util import image as image_util


def _write_images(tmp_path, n=3, size=32):
    rng = np.random.RandomState(7)
    paths = []
    for i in range(n):
        img = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        image_util.write_png(p, img)
        paths.append(p)
    return str(tmp_path / "*.png")


def _dihedral_orbit(img):
    """All 8 flip/transpose variants of an HxWxC array (H == W)."""
    out = []
    for t in (False, True):
        base = img.transpose(1, 0, 2) if t else img
        for fy in (False, True):
            for fx in (False, True):
                v = base[::-1] if fy else base
                v = v[:, ::-1] if fx else v
                out.append(v)
    return out


def test_augmented_full_image_crops_stay_in_dihedral_orbit(tmp_path):
    """patch == image size: every emitted crop must be one of the 8
    dihedral variants of one of the source images — augmentation may
    reorient but never otherwise alter pixels."""
    glob = _write_images(tmp_path, n=3, size=32)
    cfg = TrainConfig(
        train_glob=glob, batch_size=4, patch_size=32, seed=11, augment=True
    )
    sources = [
        image_util.read_png(str(tmp_path / f"{i}.png")) for i in range(3)
    ]
    orbits = [v for s in sources for v in _dihedral_orbit(s)]
    it = crop_dataset(cfg)
    seen_nonidentity = False
    for _ in range(6):
        batch = next(it)
        # Image-backed batches travel as uint8 (normalized on-device).
        assert batch.dtype == np.uint8
        for crop in batch:
            matches = [np.array_equal(crop, v) for v in orbits]
            assert any(matches), "crop is not a dihedral variant of any source"
            # Identity variants sit at orbit indices 0 (per source).
            identity = any(
                np.array_equal(crop, s) for s in sources
            )
            seen_nonidentity |= not identity
    assert seen_nonidentity, "augmentation never produced a reoriented crop"


def test_augment_false_reproduces_plain_crops(tmp_path):
    """augment=False must emit raw crops (bit-identical to slicing)."""
    glob = _write_images(tmp_path, n=2, size=48)
    cfg = TrainConfig(
        train_glob=glob, batch_size=8, patch_size=32, seed=5, augment=False
    )
    sources = [
        image_util.read_png(str(tmp_path / f"{i}.png")) for i in range(2)
    ]
    batch = next(crop_dataset(cfg))
    assert batch.dtype == np.uint8
    for crop in batch:
        found = False
        for s in sources:
            for y in range(s.shape[0] - 32 + 1):
                for x in range(s.shape[1] - 32 + 1):
                    if np.array_equal(crop, s[y : y + 32, x : x + 32]):
                        found = True
                        break
                if found:
                    break
            if found:
                break
        assert found, "unaugmented crop does not match any source window"


def test_stream_is_seed_deterministic(tmp_path):
    """Same cfg -> identical batch stream (the DP-equivalence tests rely on
    replaying the exact same data on both code paths)."""
    glob = _write_images(tmp_path, n=2, size=32)
    cfg = TrainConfig(
        train_glob=glob, batch_size=4, patch_size=32, seed=3, augment=True
    )
    a = [next(crop_dataset(cfg)) for _ in range(3)]
    b = [next(crop_dataset(cfg)) for _ in range(3)]
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
