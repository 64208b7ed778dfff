"""Collate results/synthetic/*.csv into the R-D report.

Plays the role of the reference's results/ tables plus the analysis the
VERDICT asked for: per-family rate-distortion points, and pairwise
Bjontegaard-delta PSNR (BD-PSNR) between families wherever both have at
least two curve points with overlapping rate ranges — the "curve vs curve
at matched rates" evidence for the family ordering
(ms2020 >= mbt2018 >= bmshj2018 >= bls2017 on natural-image corpora).

Curve hygiene (what counts as a point on a family's PSNR curve):

- MS-SSIM-trained checkpoints form their OWN `<family>-msssim` curves.
  Their PSNR is intentionally sacrificed for MS-SSIM, so leaving them in
  the PSNR fit poisons the polynomial (a 16 dB msssim point once swung a
  BD delta by ~8 dB).
- Rows evaluated on non-standard sets are table-only: `*-genseen` (SEEN
  training images — a memorization probe, not held-out R-D) and
  `*-genfresh` (a different fresh-seed eval set), plus literal duplicate
  operating points (`*-96px`).
- If results/synthetic/CURVES.json exists, it names the CANONICAL stems
  per family — the matched-training-budget runs — and the BD fit uses
  exactly those (that are present, 2+ required; otherwise fall back to
  every eligible point). This keeps budget-confounded short runs in the
  table as records without letting them bend the comparison curves.

BD-PSNR here follows the standard recipe: fit PSNR as a polynomial in
log10(bpp) per family (degree min(3, n_points-1)), integrate the
difference over the OVERLAPPING log-rate interval, report the mean gap in
dB (positive = first family better). With few points this is an honest
interpolation, not the 4-point VCEG fit — the point count is printed so
readers can weigh it.

Usage: python tools/rd_report.py [results/synthetic]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

# filename-prefix -> family base (msssim split happens separately).
# bmshj2018-factorized is its own architecture (factorized prior, the
# reference's bmshj2018-factorized-* zoo entries), distinct from the
# scale-hyperprior curve — order matters, first match wins.
BASES = ("bmshj2018-factorized", "bmshj2018", "bls2017", "mbt2018",
         "ms2020", "b2018", "hific")

# The literature ordering the VERDICT asks to check, best first.
ORDERING = ("ms2020", "mbt2018", "bmshj2018", "bls2017")

# Table-only evaluations: different eval sets / duplicates, never curve
# points (substring match on the stem).
TABLE_ONLY = ("genseen", "genfresh", "96px")


def load_quarantine(results_dir: str) -> dict:
    """results/synthetic/QUARANTINE.json: {stem: diagnosis}. Quarantined
    rows are degenerate artifacts of diagnosed failed runs — they stay in
    the repo as records (the CSVs are not deleted) but move to their own
    report section with the diagnosis attached, so an 11 dB row can never
    read as an unnoticed failure (VERDICT r4 weak #3)."""
    path = os.path.join(results_dir, "QUARANTINE.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        q = json.load(f)
    return {k: v for k, v in q.items() if not k.startswith("_")}


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


def family_of(stem: str):
    base = next((b for b in BASES if stem.startswith(b)), None)
    if base is None:
        return None
    return f"{base}-msssim" if "msssim" in stem else base


def collect(results_dir: str):
    """-> {family: [(bpp, psnr, msssim, stem), ...] sorted by bpp}"""
    out: dict = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*.csv"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        family = family_of(stem)
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


def curve_points(fams: dict, fam: str, manifest: dict):
    """The points that form `fam`'s comparison curve (see module doc)."""
    pts = [p for p in fams.get(fam, ()) if not any(t in p[3] for t in TABLE_ONLY)]
    wanted = manifest.get(fam)
    if wanted:
        canon = [p for p in pts if p[3] in wanted]
        if len(canon) >= 2:
            return canon, True
    return pts, False


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
    quarantine = load_quarantine(results_dir)
    qrows = []
    for fam in list(fams):
        kept = []
        for p in fams[fam]:
            if p[3] in quarantine:
                qrows.append((fam,) + p)
            else:
                kept.append(p)
        fams[fam] = kept
    manifest = {}
    mpath = os.path.join(results_dir, "CURVES.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    lines = []
    lines.append("| family | point | bpp | PSNR dB | MS-SSIM |")
    lines.append("|---|---|---|---|---|")
    for fam in sorted(fams):
        for bpp, psnr, msssim, stem in fams[fam]:
            ms = f"{msssim:.4f}" if np.isfinite(msssim) else "—"
            lines.append(f"| {fam} | {stem} | {bpp:.3f} | {psnr:.2f} | {ms} |")
    lines.append("")
    lines.append(
        "Comparison curves (MSE-trained, standard 4-image held-out eval; "
        "msssim-trained checkpoints are their own `-msssim` families and "
        "genseen/genfresh/96px rows are table-only records):"
    )
    lines.append("")
    curves = {}
    for fam in ORDERING:
        if fam not in fams:
            continue
        pts, canonical = curve_points(fams, fam, manifest)
        curves[fam] = pts
        tag = "matched-budget canonical" if canonical else "all eligible points"
        members = ", ".join(p[3] for p in pts)
        lines.append(f"- **{fam}** ({tag}): {members}")
    lines.append("")
    lines.append("Pairwise BD-PSNR over the overlapping rate range "
                 "(positive = row family better; n = curve points):")
    lines.append("")
    lines.append("| pair | BD-PSNR dB | n |")
    lines.append("|---|---|---|")
    any_pair = False
    for i, a in enumerate(ORDERING):
        for b in ORDERING[i + 1:]:
            if a not in curves or b not in curves:
                continue
            d = bd_psnr(curves[a], curves[b])
            if d is None:
                lines.append(f"| {a} vs {b} | (insufficient overlap) "
                             f"| {len(curves[a])},{len(curves[b])} |")
                continue
            any_pair = True
            lines.append(f"| {a} vs {b} | {d:+.2f} "
                         f"| {len(curves[a])},{len(curves[b])} |")
    if not any_pair:
        lines.append("| (no family pair has 2+ overlapping points yet) | | |")
    if qrows:
        lines.append("")
        lines.append(
            "## Quarantined rows (diagnosed failed runs — records, not "
            "results)"
        )
        lines.append("")
        lines.append("| family | point | bpp | PSNR dB | MS-SSIM | diagnosis |")
        lines.append("|---|---|---|---|---|---|")
        for fam, bpp, psnr, msssim, stem in sorted(qrows):
            ms = f"{msssim:.4f}" if np.isfinite(msssim) else "—"
            lines.append(
                f"| {fam} | {stem} | {bpp:.3f} | {psnr:.2f} | {ms} "
                f"| {quarantine[stem]} |"
            )
    return "\n".join(lines)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    print(report(args[0] if args else "results/synthetic"))
