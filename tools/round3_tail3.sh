#!/bin/bash
# Round-3 tail queue (2026-08-18 ~08:50 UTC). Runs AFTER round3_session3.sh
# (waits on its pid — flock waiter order is not FIFO, and session-3's
# gap-fill + generalization evidence must land first).
#
# Spends the remaining chip-day on reference-zoo completeness — the
# reference ships per-quality checkpoints for every family in both mse and
# msssim flavors (reference models/tfci.py model list), plus three HiFiC
# operating points:
#
#   T1. hific-mi (0.30 target) + hific-hi (0.45 target), 20000 steps each
#   T2. one msssim row for every remaining family (bls2017 / mbt2018 /
#       ms2020 at q5) — closes VERDICT r2 missing #7 across families
#   T3. bmshj2018 mse ladder completion: q4..q8
#   T4. extra curve points: mbt2018 q2, bls2017 q2 + q5
#   T5. R-D report regeneration + final bench
#
# Launch detached:
#   setsid nohup bash tools/round3_tail3.sh > /tmp/r3t3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${WAIT_PID:-7530}
echo "waiting for session-3 (pid $WAIT_PID) $(date -u +%H:%M:%S)"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
exec 9>/tmp/r3fc.lock
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
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 19:00" +%s)}

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }
row_commit() {
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}
train_promote() {
  local name=$1 steps=$2 tmo=$3; shift 3
  step "train $name ($steps steps)"
  try timeout "$tmo" $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps "$steps" --batch-size 8 --patch-size 256 "$@"
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
}
point() {  # point <name> <steps> <tmo> <csv> [extra train args...]
  local name=$1 steps=$2 tmo=$3 csv=$4; shift 4
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] && return 0
  [ "$(left)" -gt $(( tmo + 1500 )) ] || return 0
  train_promote "$name" "$steps" "$tmo" "$@"
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/$csv"
  row_commit "results: $name curve point (640-img set)"
}

NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
[ "$NTRAIN" -eq 640 ] || { try python tools/make_synthetic_set.py "$DATA" 640; }

# ---- T1. HiFiC mid/high operating points ---------------------------------------
for name in hific-mi hific-hi; do
  [ "$(left)" -gt 7200 ] || break
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] && continue
  train_promote "$name" 20000 7200 --patch-size 64 --checkpoint-every 4000
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --lpips --csv "$R/$name.csv"
  row_commit "results: $name operating point (640-img set)"
done

# ---- T2. msssim rows for the remaining families ---------------------------------
point bls2017-factorized-msssim-5 5000 3600 bls2017-msssim-q5.csv --lr-schedule cosine --checkpoint-every 2000
point mbt2018-mean-msssim-5 8000 4500 mbt2018-msssim-q5.csv --lr-schedule cosine --checkpoint-every 2500
point ms2020-cc10-msssim-5 12000 7200 ms2020-msssim-q5.csv --lr-schedule cosine --checkpoint-every 2000

# ---- T3. bmshj2018 mse ladder completion ----------------------------------------
for q in 4 5 6 7 8; do
  point "bmshj2018-hyperprior-mse-$q" 6000 4200 "bmshj2018-q$q.csv" \
    --lr-schedule cosine --checkpoint-every 2000
done

# ---- T4. extra curve points -------------------------------------------------------
point mbt2018-mean-mse-2 8000 4500 mbt2018-q2.csv --lr-schedule cosine --checkpoint-every 2500
point bls2017-factorized-mse-2 7000 4200 bls2017-q2.csv --lr-schedule cosine --checkpoint-every 2500
point bls2017-factorized-mse-5 7000 4200 bls2017-q5.csv --lr-schedule cosine --checkpoint-every 2500

# ---- T5. R-D report + final bench --------------------------------------------------
step "rd_report regeneration"
try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
git add results 2>/dev/null
git diff --cached --quiet || git commit -q -m "results: regenerated R-D report (full-ladder round-3 tables)" || true
step "final bench.py"
try timeout 2400 python bench.py > /tmp/bench_r3t3.json 2>/tmp/bench_r3t3.log
cat /tmp/bench_r3t3.json
step "tail queue done; chip idle with $(left)s to deadline"
