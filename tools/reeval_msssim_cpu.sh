#!/bin/bash
# Re-evaluate result rows whose msssim column predates the round-3 metric
# fix (unit-range normalization + HIGHEST-precision convs in
# util/image.py). Runs on CPU so it never contends for the exclusive TPU
# chip; bpp/psnr agree with the TPU rows to ~0.02 dB, msssim is the only
# column that changes materially.
#   setsid nohup bash tools/reeval_msssim_cpu.sh > /tmp/reeval_msssim.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1 JAX_PLATFORMS=cpu
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${1:-/tmp/tpc_data}
R=results/synthetic
TFCI="python -m compression_tpu.cli.tfci"

run() { echo "=== $1 -> $2 $(date -u +%H:%M:%S) ==="; \
        $TFCI eval "$1" "$DATA/eval/*.png" --csv "$2" || echo "!!! FAILED $1"; }

run bls2017 $R/bls2017.csv
run bmshj2018 $R/bmshj2018.csv
run bmshj2018-2 $R/bmshj2018-q2.csv
run bmshj2018-3 $R/bmshj2018-q3.csv
run mbt2018 $R/mbt2018.csv
for q in 1 2 3 4; do
  run "b2018-gdn-128-$q" "$R/b2018-gdn-128-q$q.csv"
done
echo "=== reeval done $(date -u +%H:%M:%S) ==="
