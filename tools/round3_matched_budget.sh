#!/bin/bash
# Round-3 matched-budget curve queue (2026-08-18 ~21:00 UTC).
#
# Purpose: the family-ordering evidence (VERDICT r2 item 1) is currently
# budget-confounded — ms2020 trained 40-44k steps, mbt2018-long 25k, but
# bmshj2018's ladder only 6k and the mbt2018 q-points 8k, so the BD-PSNR
# table compares apples to oranges. This queue retrains the comparison
# links as FRESH 25000-step cosine runs (same data, batch, patch, schedule
# as mbt2018-long) so curve-vs-curve deltas reflect the models, not their
# training budgets. Rows land as *-long.csv next to the originals; the
# originals stay as the short-budget record.
#
# Launch detached:
#   setsid nohup bash tools/round3_matched_budget.sh > /tmp/r3mb.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
exec 9>/tmp/r3fc.lock
echo "waiting for chip lock $(date -u +%H:%M:%S)"
flock 9
echo "lock acquired $(date -u +%H:%M:%S)"
echo $$ > /tmp/r3fc.pid
export PYTHONUNBUFFERED=1
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export TPC_MODEL_DIR=/root/.cache/compression_tpu
mkdir -p "$TPC_MODEL_DIR"
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic
# Leave headroom before the ~12h wall from session start (20:50 UTC).
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-19 07:30" +%s)}

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }
row_commit() {
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}

NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
if [ "$NTRAIN" -ne 640 ]; then
  step "regenerating dataset ($NTRAIN != 640 images present)"
  rm -rf "$DATA"
  try python tools/make_synthetic_set.py "$DATA" 640
fi

# Fresh matched-budget run: wipe the resume state, train STEPS steps with
# the long recipe, promote, eval to <csv>.
long_run() {
  local name=$1 steps=$2 tmo=$3 csv=$4; shift 4
  [ -f "$R/$csv" ] && { step "skip $name ($csv exists)"; return 0; }
  [ "$(left)" -gt $(( tmo + 2400 )) ] || { step "skip $name (time)"; return 0; }
  step "fresh $steps-step run: $name"
  rm -f "$TPC_MODEL_DIR/$name.train.msgpack" \
        "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
  try timeout "$tmo" $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps "$steps" --batch-size 8 --patch-size 256 \
    --lr-schedule cosine --checkpoint-every 2500 "$@"
  try python tools/promote_train_ckpt.py "$name"
  step "eval $name -> $csv"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/$csv"
  row_commit "results: $name matched-budget 25000-step run (640-img set)"
}

regen_report() {
  step "regenerate R-D report"
  try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "results: regenerated R-D report (matched-budget rows)" || true
}

# Ordered by family-ordering leverage:
# 1. a low-rate mbt point INSIDE ms2020's 0.07-0.11 bpp range, the
#    lambda=0.01 bmshj twin of mbt2018-long, and a 25k ms2020 point
#    (exact budget match to the mbt/bmshj long runs, under a q-name so
#    the 40k anchor checkpoint is not clobbered).
long_run mbt2018-mean-mse-1        25000 9000 mbt2018-q1-long.csv
long_run bmshj2018                 25000 9000 bmshj2018-long.csv
long_run ms2020-cc10-mse-4         25000 12000 ms2020-q4-long.csv
regen_report
# 2. fill each curve to 3+ points spanning a shared window.
long_run mbt2018-mean-mse-2        25000 9000 mbt2018-q2-long.csv
long_run bmshj2018-hyperprior-mse-2 25000 9000 bmshj2018-q2-long.csv
long_run mbt2018-mean-mse-5        25000 9000 mbt2018-q5-long.csv
long_run bmshj2018-hyperprior-mse-5 25000 9000 bmshj2018-q5-long.csv
regen_report
# 3. the bls2017 anchor at the same budget (bottom of the ordering).
long_run bls2017                   25000 8000 bls2017-long.csv
# 4. msssim twins that look undertrained (ms2020-msssim PSNR 16 dB and
#    msssim BELOW its mse twin; mbt msssim below mbt-long).
long_run ms2020-cc10-msssim-5      12000 9000 ms2020-msssim-q5-v2.csv
long_run mbt2018-mean-msssim-5     12000 7200 mbt2018-msssim-q5-v2.csv
regen_report
echo "=== matched-budget queue done $(date -u +%H:%M:%S) ==="
