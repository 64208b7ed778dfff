#!/bin/bash
# Round-3 priority mini-queue. Waits for the running round3_queue.sh to
# finish its ms2020 train+eval (its items 0-1), then takes over the chip:
#
#   A. bench.py with host AND device coders + bench_charm (numbers of
#      record for BASELINE.md; picks the faster default).
#   B. b2018 fresh retrain with the per-example-quality fix (VERDICT #2
#      validation) — the old checkpoint predates the fix.
#   C. bmshj2018 msssim-trained row (VERDICT #5).
#   D. hific-lo rate-hinge run with whatever chip time remains (VERDICT #3).
#
# All image-set EVALS run on CPU (JAX_PLATFORMS=cpu): with the persistent
# compilation cache warm they cost ~1 min each and keep the exclusive TPU
# chip free for training. CPU-vs-TPU eval deltas are ~0.07 dB (see
# results/synthetic/README.md round-3 note).
#
# Launch detached:
#   setsid nohup bash tools/round3_priority_queue.sh > /tmp/r3pq.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${1:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
CPU_TFCI="env JAX_PLATFORMS=cpu python -m compression_tpu.cli.tfci"
R=results/synthetic
# Hard chip deadline (UTC epoch): leave the chip idle before the driver's
# round-end bench (~21:05Z). No training may start that can't be killed.
DEADLINE=$(date -u -d "2026-08-17 20:40" +%s)

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }

# ---- 0. wait for the main queue's ms2020 train+eval, then take the chip ---
step "waiting for ms2020 eval from round3_queue (pid $(cat /tmp/r3q.pid))"
while kill -0 "$(cat /tmp/r3q.pid)" 2>/dev/null; do
  if grep -q "wrote results/synthetic/ms2020.csv" /tmp/r3q.log; then
    step "ms2020 row written — stopping round3_queue group"
    kill -TERM -- "-$(cat /tmp/r3q.pid)" 2>/dev/null
    sleep 10
    kill -KILL -- "-$(cat /tmp/r3q.pid)" 2>/dev/null
    break
  fi
  # Failsafe: if the 26000-step run overruns the budget, cut it anyway —
  # the per-1000-step checkpoint is evaluable.
  if [ "$(left)" -lt 12600 ]; then
    step "deadline pressure — cutting round3_queue early"
    kill -TERM -- "-$(cat /tmp/r3q.pid)" 2>/dev/null
    sleep 10
    kill -KILL -- "-$(cat /tmp/r3q.pid)" 2>/dev/null
    step "eval ms2020 from latest checkpoint (CPU)"
    try $CPU_TFCI eval ms2020 "$DATA/eval/*.png" --csv $R/ms2020.csv
    break
  fi
  sleep 60
done
sleep 5

# ---- A. benches (chip) ---------------------------------------------------
step "bench.py (host coder)"
try timeout 1800 python bench.py 2>/tmp/bench_r3_host.log
tail -2 /tmp/bench_r3_host.log
step "bench.py (device coder)"
try env TPC_BENCH_CODER=device timeout 1800 python bench.py 2>/tmp/bench_r3_device.log
tail -2 /tmp/bench_r3_device.log
step "bench_charm"
try timeout 1800 python tools/bench_charm.py

# ---- B. b2018 retrain with the per-example-quality fix -------------------
step "b2018 fresh retrain (4000 steps, per-example-quality fix)"
rm -f $TPC_MODEL_DIR/b2018-gdn-128.msgpack \
      $TPC_MODEL_DIR/b2018-gdn-128.train.msgpack \
      $TPC_MODEL_DIR/b2018-gdn-128.train.msgpack.metrics.csv
try $TFCI train b2018-gdn-128-1 --glob "$DATA/train/*.png" --steps 4000 \
  --batch-size 8 --patch-size 256 --lr-schedule cosine --checkpoint-every 500
for q in 1 2 3 4; do
  step "eval b2018-gdn-128-$q (CPU)"
  try $CPU_TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" \
    --csv "$R/b2018-gdn-128-q$q.csv"
done

# ---- C. bmshj2018 msssim row ---------------------------------------------
if [ "$(left)" -gt 3600 ]; then
  step "train bmshj2018-hyperprior-msssim-5 (3000 steps)"
  try $TFCI train bmshj2018-hyperprior-msssim-5 --glob "$DATA/train/*.png" \
    --steps 3000 --batch-size 8 --patch-size 256 --lr-schedule cosine
  step "eval bmshj2018-hyperprior-msssim-5 (CPU)"
  try $CPU_TFCI eval bmshj2018-hyperprior-msssim-5 "$DATA/eval/*.png" \
    --csv $R/bmshj2018-msssim-q5.csv
fi

# ---- D. hific-lo rate-hinge demonstration (remaining time) ---------------
BUDGET=$(left)
if [ "$BUDGET" -gt 2400 ]; then
  # ~11 s/100 steps at patch 64 once compiled; cap so training ends by
  # the deadline. tfci train is resumable, so a kill loses <500 steps.
  STEPS=$(( (BUDGET - 1500) / 2 ))
  [ "$STEPS" -gt 10000 ] && STEPS=10000
  step "train hific-lo ($STEPS steps, fresh, rate-hinge demo)"
  rm -f $TPC_MODEL_DIR/hific-lo.msgpack $TPC_MODEL_DIR/hific-lo.train.msgpack
  try timeout $(( BUDGET - 1200 )) $TFCI train hific-lo \
    --glob "$DATA/train/*.png" --steps "$STEPS" --batch-size 8 --patch-size 64
  step "eval hific-lo (CPU)"
  try $CPU_TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv
fi

step "priority queue done; chip left idle $(left)s before deadline"
