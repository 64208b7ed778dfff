#!/bin/bash
# Round-2 TPU work queue: runs after tools/retrain_all.sh completes.
# 1) bench.py (BENCH r02 preview + per-stage overlap table)
# 2) short HiFiC-lo GAN training on the synthetic set + eval row
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

# Wait for the retrain job to finish (pid file written by the launcher).
if [ -f /tmp/retrain.pid ]; then
  while kill -0 "$(cat /tmp/retrain.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== bench $(date -u +%H:%M:%S) ==="
python bench.py 2>/tmp/bench_r02_stages.log || true
echo "--- stage table ---"; cat /tmp/bench_r02_stages.log | tail -40 || true

echo "=== hific-lo train $(date -u +%H:%M:%S) ==="
python -m compression_tpu.cli.tfci train hific-lo --steps 1500 \
  --batch-size 8 --patch-size 128 --glob "$DATA/train/*.png"
echo "=== hific-lo eval $(date -u +%H:%M:%S) ==="
python -m compression_tpu.cli.tfci eval hific-lo "$DATA/eval/*.png" \
  --csv results/synthetic/hific-lo.csv
echo "=== queue done $(date -u +%H:%M:%S) ==="
