#!/bin/bash
# Round-3 tail queue #5 (2026-08-18 ~15:00 UTC). Runs AFTER round3_tail4.sh
# (waits on its pid). Spends the remaining chip time on reference-zoo
# completeness:
#
#   V1. b2018-leaky_relu-128: the second b2018 activation variant the
#       reference ships (models/tfci.py b2018 list) — one checkpoint,
#       4 runtime rate points, same fixed per-example-quality recipe that
#       produced the monotone gdn-128 ladder.
#   V2. ms2020-cc10-mse-7: a high-rate CHARM curve point (fine-tuned from
#       the 40000-step base like q2/q5) — extends the flagship family's
#       curve to 4 points.
#   V3. mbt2018-mean-mse-7: matching high-rate point for the mbt curve.
#   V4. final R-D report regeneration + bench refresh.
#
# Launch detached:
#   setsid nohup bash tools/round3_tail5.sh > /tmp/r3t5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${WAIT_PID:-31181}
echo "waiting for tail4 (pid $WAIT_PID) $(date -u +%H:%M:%S)"
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

# ---- V1. b2018-leaky_relu-128 ladder ---------------------------------------
if [ ! -f "$TPC_MODEL_DIR/b2018-leaky_relu-128.msgpack" ] && [ "$(left)" -gt 9000 ]; then
  step "train b2018-leaky_relu-128 (9000 steps, fixed recipe)"
  try timeout 7200 $TFCI train b2018-leaky_relu-128 --glob "$DATA/train/*.png" \
    --steps 9000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
    --checkpoint-every 3000
  [ -f "$TPC_MODEL_DIR/b2018-leaky_relu-128.msgpack" ] || \
    try python tools/promote_train_ckpt.py b2018-leaky_relu-128
  for q in 1 2 3 4; do
    step "eval b2018-leaky_relu-128-$q"
    try timeout 1800 $TFCI eval "b2018-leaky_relu-128-$q" "$DATA/eval/*.png" \
      --csv "$R/b2018-leaky_relu-128-q$q.csv"
  done
  row_commit "results: b2018-leaky_relu-128 ladder, 4 rows (640-img set)"
fi

# ---- V2. ms2020 high-rate curve point ---------------------------------------
name=ms2020-cc10-mse-7
if [ ! -f "$TPC_MODEL_DIR/$name.msgpack" ] && [ -f "$TPC_MODEL_DIR/ms2020.msgpack" ] && [ "$(left)" -gt 6000 ]; then
  step "fine-tune $name from ms2020 main (4000 steps)"
  cp "$TPC_MODEL_DIR/ms2020.msgpack" "$TPC_MODEL_DIR/$name.train.msgpack"
  rm -f "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
  try timeout 3600 $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps 44000 --batch-size 8 --patch-size 256 \
    --lr 3e-5 --lr-schedule constant --checkpoint-every 2000
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/ms2020-q7.csv"
  row_commit "results: $name fine-tune curve point (640-img set)"
fi

# ---- V3. mbt2018 high-rate curve point --------------------------------------
name=mbt2018-mean-mse-7
if [ ! -f "$TPC_MODEL_DIR/$name.msgpack" ] && [ "$(left)" -gt 5500 ]; then
  step "train $name (6000 steps)"
  try timeout 4200 $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps 6000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
    --checkpoint-every 2000
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/mbt2018-q7.csv"
  row_commit "results: $name curve point (640-img set)"
fi

# ---- V4. final report + bench ------------------------------------------------
step "rd_report regeneration"
try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
git add results 2>/dev/null
git diff --cached --quiet || git commit -q -m "results: regenerated R-D report (tail5 rows)" || true

step "final bench.py"
try timeout 1800 python bench.py
step "tail5 queue done; chip idle with $(left)s to deadline"
