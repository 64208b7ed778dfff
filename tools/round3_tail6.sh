#!/bin/bash
# Round-3 tail queue #6 (2026-08-18 ~15:40 UTC). Runs AFTER round3_tail5.sh
# (waits on its pid). Spends the remaining chip time on:
#
#   W1. b2018-gdn-192 + b2018-leaky_relu-192 ladders — the last two of the
#       reference's four b2018 variants (models/tfci.py list), 4 runtime
#       rate points each from one checkpoint.
#   W2. hific-hi retrained fresh at 96px patches (12000 steps): at 64px the
#       three operating points barely separate because patch-scale rate
#       statistics compress toward each other; larger patches let the
#       0.45-target hinge hold rate up. Evaluated to a NEW csv
#       (hific-hi-96px.csv) so the 64px row of record stays.
#   W3. hific-lo at 96px if time remains (push toward the 0.14 target).
#   W4. final R-D report + bench refresh.
#
# Launch detached:
#   setsid nohup bash tools/round3_tail6.sh > /tmp/r3t6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${WAIT_PID:-26144}
echo "waiting for tail5 (pid $WAIT_PID) $(date -u +%H:%M:%S)"
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

NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
[ "$NTRAIN" -eq 640 ] || { try python tools/make_synthetic_set.py "$DATA" 640; }

# ---- W1. remaining b2018 variants -------------------------------------------
for base in b2018-gdn-192 b2018-leaky_relu-192; do
  [ -f "$TPC_MODEL_DIR/$base.msgpack" ] && continue
  [ "$(left)" -gt 5400 ] || break
  step "train $base (9000 steps, fixed recipe)"
  try timeout 4500 $TFCI train "$base" --glob "$DATA/train/*.png" \
    --steps 9000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
    --checkpoint-every 3000
  [ -f "$TPC_MODEL_DIR/$base.msgpack" ] || try python tools/promote_train_ckpt.py "$base"
  for q in 1 2 3 4; do
    step "eval $base-$q"
    try timeout 1800 $TFCI eval "$base-$q" "$DATA/eval/*.png" \
      --csv "$R/$base-q$q.csv"
  done
  row_commit "results: $base ladder, 4 rows (640-img set)"
done

# ---- W2/W3. hific operating-point separation at 96px ------------------------
for name in hific-hi hific-lo; do
  [ -f "$R/$name-96px.csv" ] && continue
  [ "$(left)" -gt 6600 ] || break
  step "train $name fresh at 96px (12000 steps)"
  try timeout 6000 $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps 12000 --batch-size 8 --patch-size 96 --checkpoint-every 3000
  step "eval $name (96px run)"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --lpips \
    --csv "$R/$name-96px.csv"
  row_commit "results: $name 96px-patch operating point (640-img set)"
done

# ---- W4. final report + bench ------------------------------------------------
step "rd_report regeneration"
try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
git add results 2>/dev/null
git diff --cached --quiet || git commit -q -m "results: regenerated R-D report (tail6 rows)" || true

step "final bench.py"
try timeout 1800 python bench.py
step "tail6 queue done; chip idle with $(left)s to deadline"
