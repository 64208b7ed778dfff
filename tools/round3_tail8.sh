#!/bin/bash
# Round-3 tail queue #8 (2026-08-18 ~21:15 UTC). Runs AFTER
# round3_matched_budget.sh (waits on its pid via /tmp/r3fc.pid).
#
# W1. GENUINE hific operating-point separation runs at 96px patches.
#     tail6's attempt trained zero steps (it resumed checkpoints already
#     past --steps and re-evaluated the old 64px models; those duplicate
#     rows were removed in commit 7d11b61). Fresh runs here REMOVE the
#     resume state first — the actual fix for that failure mode.
# W2. Final bench.py (throughput + latency) so BASELINE quotes a fresh
#     stage table from this session.
# W3. Regenerate the R-D report + API docs, commit.
#
# Launch detached:
#   setsid nohup bash tools/round3_tail8.sh > /tmp/r3t8.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${WAIT_PID:-$(cat /tmp/r3fc.pid)}
echo "waiting for matched-budget queue (pid $WAIT_PID) $(date -u +%H:%M:%S)"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
exec 9>/tmp/r3fc.lock
flock 9
echo "lock acquired $(date -u +%H:%M:%S)"
echo $$ > /tmp/r3fc.pid
export PYTHONUNBUFFERED=1
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-19 08:00" +%s)}

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }
row_commit() {
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}

# ---- W1. hific fresh 96px runs (lo/mi/hi separation) -------------------------
for name in hific-lo hific-mi hific-hi; do
  [ -f "$R/$name-96px.csv" ] && { step "skip $name (row exists)"; continue; }
  [ "$(left)" -gt 7800 ] || { step "skip $name (time)"; break; }
  step "train $name FRESH at 96px (12000 steps)"
  rm -f "$TPC_MODEL_DIR/$name.train.msgpack" \
        "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
  try timeout 6000 $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps 12000 --batch-size 8 --patch-size 96 --checkpoint-every 3000
  try python tools/promote_train_ckpt.py "$name" --force
  step "eval $name (96px run)"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --lpips \
    --csv "$R/$name-96px.csv"
  row_commit "results: $name genuine 96px-patch run (fresh 12000 steps, 640-img set)"
done

# ---- W2. final bench ----------------------------------------------------------
if [ "$(left)" -gt 3600 ]; then
  step "final bench.py (throughput)"
  try timeout 2400 python bench.py > /tmp/bench_r3t8.json 2>/tmp/bench_r3t8.log
  cat /tmp/bench_r3t8.json 2>/dev/null
  tail -20 /tmp/bench_r3t8.log 2>/dev/null
fi
if [ "$(left)" -gt 1800 ]; then
  step "final bench.py (latency mode)"
  try bash -c "TPC_BENCH_MODE=latency timeout 1500 python bench.py > /tmp/bench_r3t8_lat.json 2>/tmp/bench_r3t8_lat.log"
  cat /tmp/bench_r3t8_lat.json 2>/dev/null
fi

# ---- W3. reports + docs --------------------------------------------------------
step "rd_report + docs regeneration"
try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
try python tools/gen_docs.py
git add "$R" docs 2>/dev/null
git diff --cached --quiet || git commit -q -m "results: regenerated R-D report and API docs (tail8)" || true
echo "=== tail8 done $(date -u +%H:%M:%S); chip idle with $(left)s to deadline ==="
