#!/bin/bash
# Round-3 follow-on TPU chain (run AFTER tools/round3_queue.sh finishes or
# is stopped at its stretch step). Priorities:
#   1. Device-coder (on-TPU rANS) bench vs host coder — the round-3
#      throughput feature. Also the in-jit decode bench note (VERDICT #6).
#   2. b2018 fresh retrain with the per-example-quality fix + 10x
#      prior/gain lr (round-3 root cause) + ladder re-eval.
#
# Launch detached:  setsid nohup bash tools/round3_chain2.sh > /tmp/r3c2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${1:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED ($*) — continuing"; }

# Wait for any prior TPU queue to release the chip.
if [ -f /tmp/r3q.pid ]; then
  QPID=$(cat /tmp/r3q.pid)
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi

# ---- 1. coder benches ----------------------------------------------------
step "bench.py host coder"
try python bench.py 2>/tmp/bench_host_r3.log; tail -2 /tmp/bench_host_r3.log
step "bench.py device coder (rANS)"
TPC_BENCH_CODER=device try python bench.py 2>/tmp/bench_dev_r3.log; tail -2 /tmp/bench_dev_r3.log
step "bench_jit_decode"
try python tools/bench_jit_decode.py

# ---- 2. b2018 retrain with the round-3 fix -------------------------------
step "b2018 fresh retrain (8000 steps cosine, per-example qualities)"
rm -f $TPC_MODEL_DIR/b2018-gdn-128.msgpack \
      $TPC_MODEL_DIR/b2018-gdn-128.train.msgpack \
      $TPC_MODEL_DIR/b2018-gdn-128.train.msgpack.metrics.csv \
      $TPC_MODEL_DIR/b2018-gdn-128.msgpack.*.tables.npz
try $TFCI train b2018-gdn-128 --glob "$DATA/train/*.png" --steps 8000 \
  --batch-size 8 --patch-size 256 --lr-schedule cosine --checkpoint-every 500
for q in 1 2 3 4; do
  step "eval b2018-gdn-128-$q"
  try $TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" --csv "$R/b2018-gdn-128-q$q.csv"
done

step "chain2 done"
