#!/bin/bash
# Insurance for the resumed ms2020 16000-step retrain: the round may end at
# any driver tick, so as soon as each periodic checkpoint lands
# (checkpoint-every 4000), promote it to the eval name. That guarantees a
# valid ms2020.msgpack exists for bench/CLI/the final eval even if the round
# is cut mid-train. NOTE: this host has ONE CPU core — an interim CPU eval
# of the 114M-param CHARM was measured counterproductive (hours of wall
# time that starve the trainer's host input pipeline), so this watcher
# promotes only; all evals belong to the chip queue.
#   setsid nohup bash tools/ms2020_interim_cpu_eval.sh > /tmp/ms2020_interim.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1 JAX_PLATFORMS=cpu
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${DATA:-/tmp/tpc_data}
R=results/synthetic
SRC="$TPC_MODEL_DIR/ms2020.train.msgpack"
SEEN_MTIME=$(stat -c %Y "$SRC" 2>/dev/null || echo 0)  # skip the step-4000 save

for i in $(seq 1 400); do
  sleep 60
  # Once the trainer exits, the chip queue owns promotion + the final eval.
  TRAIN_PID=$(cat /tmp/ms2020_train.pid 2>/dev/null || echo "")
  if [ -z "$TRAIN_PID" ] || ! kill -0 "$TRAIN_PID" 2>/dev/null; then
    echo "trainer exited; final eval belongs to the chip queue — stopping"
    break
  fi
  M=$(stat -c %Y "$SRC" 2>/dev/null || echo 0)
  if [ "$M" -gt "$SEEN_MTIME" ]; then
    SEEN_MTIME=$M
    echo "=== new periodic ms2020 checkpoint (mtime $M); promoting $(date -u +%H:%M:%S) ==="
    python tools/promote_train_ckpt.py ms2020 --force || continue
    echo "=== promoted $(date -u +%H:%M:%S) ==="
  fi
done
