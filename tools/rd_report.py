"""Collate results/synthetic/*.csv into the R-D report.

Plays the role of the reference's results/ tables plus the analysis the
VERDICT asked for: per-family rate-distortion points, and pairwise
Bjontegaard-delta PSNR (BD-PSNR) between families wherever both have at
least two curve points with overlapping rate ranges — the "curve vs curve
at matched rates" evidence for the family ordering
(ms2020 >= mbt2018 >= bmshj2018 >= bls2017 on natural-image corpora).

BD-PSNR here follows the standard recipe: fit PSNR as a polynomial in
log10(bpp) per family (degree min(3, n_points-1)), integrate the
difference over the OVERLAPPING log-rate interval, report the mean gap in
dB (positive = first family better). With few points this is an honest
interpolation, not the 4-point VCEG fit — the point count is printed so
readers can weigh it.

Usage: python tools/rd_report.py [results/synthetic] [--markdown]
"""

from __future__ import annotations

import glob
import os
import re
import sys

import numpy as np

# filename-prefix -> family, first match wins (order matters:
# bmshj2018-msssim is its own curve, distinct from the mse family).
FAMILIES = (
    ("bmshj2018-msssim", "bmshj2018-msssim"),
    ("bmshj2018", "bmshj2018"),
    ("bls2017", "bls2017"),
    ("mbt2018", "mbt2018"),
    ("ms2020", "ms2020"),
    ("b2018", "b2018"),
    ("hific", "hific"),
)

# The literature ordering the VERDICT asks to check, best first.
ORDERING = ("ms2020", "mbt2018", "bmshj2018", "bls2017")


def read_mean_row(path: str):
    """Returns (bpp, psnr, msssim) from the csv's `mean` row."""
    with open(path) as f:
        header = f.readline().strip().split(",")
        for line in f:
            cells = line.strip().split(",")
            if cells and cells[0] == "mean":
                row = dict(zip(header, cells))
                return (
                    float(row["bpp"]),
                    float(row["psnr"]),
                    float(row.get("msssim", "nan")),
                )
    raise ValueError(f"no mean row in {path}")


def collect(results_dir: str):
    """-> {family: [(bpp, psnr, msssim, stem), ...] sorted by bpp}"""
    out: dict = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*.csv"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        family = next((fam for pre, fam in FAMILIES if stem.startswith(pre)), None)
        if family is None:
            continue
        try:
            bpp, psnr, msssim = read_mean_row(path)
        except Exception as e:
            print(f"skip {stem}: {e}", file=sys.stderr)
            continue
        out.setdefault(family, []).append((bpp, psnr, msssim, stem))
    for fam in out:
        out[fam].sort()
    return out


def bd_psnr(points_a, points_b):
    """BD-PSNR of curve a over curve b (positive: a is better), or None
    if either curve has <2 points or the rate ranges don't overlap."""
    if len(points_a) < 2 or len(points_b) < 2:
        return None
    ra = np.log10([p[0] for p in points_a])
    da = np.array([p[1] for p in points_a])
    rb = np.log10([p[0] for p in points_b])
    db = np.array([p[1] for p in points_b])
    lo = max(ra.min(), rb.min())
    hi = min(ra.max(), rb.max())
    if hi <= lo:
        return None
    pa = np.polynomial.Polynomial.fit(ra, da, deg=min(3, len(ra) - 1))
    pb = np.polynomial.Polynomial.fit(rb, db, deg=min(3, len(rb) - 1))
    ia = pa.integ()
    ib = pb.integ()
    return float(((ia(hi) - ia(lo)) - (ib(hi) - ib(lo))) / (hi - lo))


def report(results_dir: str = "results/synthetic") -> str:
    fams = collect(results_dir)
    lines = []
    lines.append("| family | point | bpp | PSNR dB | MS-SSIM |")
    lines.append("|---|---|---|---|---|")
    for fam in sorted(fams):
        for bpp, psnr, msssim, stem in fams[fam]:
            ms = f"{msssim:.4f}" if np.isfinite(msssim) else "—"
            lines.append(f"| {fam} | {stem} | {bpp:.3f} | {psnr:.2f} | {ms} |")
    lines.append("")
    lines.append("Pairwise BD-PSNR over the overlapping rate range "
                 "(positive = row family better; n = curve points):")
    lines.append("")
    lines.append("| pair | BD-PSNR dB | n |")
    lines.append("|---|---|---|")
    any_pair = False
    for i, a in enumerate(ORDERING):
        for b in ORDERING[i + 1:]:
            if a not in fams or b not in fams:
                continue
            d = bd_psnr(fams[a], fams[b])
            if d is None:
                lines.append(f"| {a} vs {b} | (insufficient overlap) "
                             f"| {len(fams[a])},{len(fams[b])} |")
                continue
            any_pair = True
            lines.append(f"| {a} vs {b} | {d:+.2f} "
                         f"| {len(fams[a])},{len(fams[b])} |")
    if not any_pair:
        lines.append("| (no family pair has 2+ overlapping points yet) | | |")
    return "\n".join(lines)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    print(report(args[0] if args else "results/synthetic"))
