#!/bin/bash
# Round-3 tail queue #4 (2026-08-18 ~11:00 UTC). Runs AFTER round3_tail3.sh
# (waits on its pid). Lands R-D rows for the families added this session:
#
#   U1. bmshj2018-factorized-mse-3: the bmshj2018 paper's factorized-prior
#       baseline (reference zoo family; should sit between bls2017 and
#       bmshj2018-hyperprior on the R-D plane — that ordering is itself
#       evidence the transforms and prior compose correctly).
#   U2. bmshj2018-factorized-mse-6 second curve point (rate spread).
#   U3. final R-D report + bench refresh if time remains.
#
# Launch detached:
#   setsid nohup bash tools/round3_tail4.sh > /tmp/r3t4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${WAIT_PID:-9291}
echo "waiting for tail3 (pid $WAIT_PID) $(date -u +%H:%M:%S)"
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
point() {  # point <name> <steps> <tmo> <csv> [extra train args...]
  local name=$1 steps=$2 tmo=$3 csv=$4; shift 4
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] && return 0
  [ "$(left)" -gt $(( tmo + 1500 )) ] || return 0
  step "train $name ($steps steps)"
  try timeout "$tmo" $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps "$steps" --batch-size 8 --patch-size 256 "$@"
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/$csv"
  row_commit "results: $name curve point (640-img set)"
}

NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
[ "$NTRAIN" -eq 640 ] || { try python tools/make_synthetic_set.py "$DATA" 640; }

point bmshj2018-factorized-mse-3 6000 4200 bmshj2018-factorized-q3.csv \
  --lr-schedule cosine --checkpoint-every 2000
point bmshj2018-factorized-mse-6 6000 4200 bmshj2018-factorized-q6.csv \
  --lr-schedule cosine --checkpoint-every 2000

step "rd_report regeneration"
try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
git add results 2>/dev/null
git diff --cached --quiet || git commit -q -m "results: regenerated R-D report (incl. bmshj2018-factorized rows)" || true
step "tail4 queue done; chip idle with $(left)s to deadline"
