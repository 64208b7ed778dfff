#!/bin/bash
# Insurance eval for the resumed ms2020 16000-step retrain: the round may
# end at any driver tick, so as soon as each periodic checkpoint lands
# (checkpoint-every 4000), promote it and evaluate ON CPU (never contending
# for the exclusive chip), committing the row to ms2020-interim.csv — a
# separate file from the chip queue's final ms2020.csv, so a slow CPU eval
# finishing late can never clobber the real row. Promotion also guarantees
# a valid ms2020.msgpack exists for bench/CLI if the round is cut mid-train.
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
  if ! pgrep -f "tfci train ms2020 " >/dev/null 2>&1; then
    echo "trainer exited; final eval belongs to the chip queue — stopping"
    break
  fi
  M=$(stat -c %Y "$SRC" 2>/dev/null || echo 0)
  if [ "$M" -gt "$SEEN_MTIME" ]; then
    SEEN_MTIME=$M
    echo "=== new periodic ms2020 checkpoint (mtime $M); promoting + CPU eval $(date -u +%H:%M:%S) ==="
    python tools/promote_train_ckpt.py ms2020 --force || continue
    timeout 7200 python -m compression_tpu.cli.tfci eval ms2020 \
      "$DATA/eval/*.png" --csv "$R/ms2020-interim.csv" || { echo "!!! eval failed"; continue; }
    git add "$R/ms2020-interim.csv" && git diff --cached --quiet || \
      git commit -q -m "results: interim ms2020 CPU eval row (periodic checkpoint)" || true
    echo "=== row committed $(date -u +%H:%M:%S) ==="
  fi
done
