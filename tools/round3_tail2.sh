#!/bin/bash
# Round-3 slack consumer: after round3_endgame.sh releases the chip, spend
# the remaining pre-deadline time on the mbt2018 lambda sweep (VERDICT r2
# item 1b: >= 3 rate points per advanced family) — retrained on the
# regenerated 160-image augmented set. q3 (lambda 0.0075) first: it is the
# matched-rate partner for ms2020's expected operating point.
#
# Launch detached:
#   setsid nohup bash tools/round3_tail2.sh > /tmp/r3tail2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=/tmp/tpc_data
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic
DEADLINE=$(date -u -d "2026-08-17 20:36" +%s)

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }

ENDGAME_PID=$(cat /tmp/r3end.pid 2>/dev/null || echo 0)
step "waiting for endgame (pid $ENDGAME_PID) to release the chip"
while kill -0 "$ENDGAME_PID" 2>/dev/null; do
  if [ "$(left)" -lt 2700 ]; then
    step "not enough slack left for a sweep point; exiting"
    exit 0
  fi
  sleep 60
done

for q in 3 2; do
  BUDGET=$(( $(left) - 900 ))           # keep 15 min for the eval pair
  if [ "$BUDGET" -lt 1800 ]; then
    step "only ${BUDGET}s left — stopping the sweep"
    break
  fi
  [ "$BUDGET" -gt 2400 ] && BUDGET=2400  # ~6000 steps at ~2.5 steps/s
  STEPS=6000
  step "train mbt2018-$q ($STEPS steps, timeout ${BUDGET}s)"
  rm -f "$TPC_MODEL_DIR/mbt2018-$q.train.msgpack" \
        "$TPC_MODEL_DIR/mbt2018-$q.train.msgpack.metrics.csv"
  try timeout "$BUDGET" $TFCI train "mbt2018-$q" --glob "$DATA/train/*.png" \
    --steps "$STEPS" --batch-size 8 --patch-size 256 --lr-schedule cosine \
    --checkpoint-every 500
  if [ ! -f "$TPC_MODEL_DIR/mbt2018-$q.msgpack" ]; then
    try python tools/promote_train_ckpt.py "mbt2018-$q"
  fi
  step "eval mbt2018-$q"
  try timeout 1200 $TFCI eval "mbt2018-$q" "$DATA/eval/*.png" \
    --csv "$R/mbt2018-q$q.csv"
done

step "tail2 done; chip idle with $(left)s to deadline"
