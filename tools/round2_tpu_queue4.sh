#!/bin/bash
# Round-2 TPU queue, stage 4: extended training (resumes the stage-2 train
# states) to converge the R-D ordering, then final evals.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 30; done
fi

extend() {  # model total_steps
  echo "=== extend $1 -> $2 steps $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci train "$1" --glob "$DATA/train/*.png" \
    --steps "$2" --batch-size 8 --patch-size 256
  echo "=== eval $1 $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci eval "$1" "$DATA/eval/*.png" \
    --csv "results/synthetic/$1.csv"
}

extend mbt2018 8000
extend ms2020 8000
extend bmshj2018 6000
echo "=== queue4 done $(date -u +%H:%M:%S) ==="
