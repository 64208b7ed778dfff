#!/bin/bash
# Round-2 TPU chain, part 4: bmshj2018 low-rate quality points for a
# MATCHED-RATE comparison against ms2020's lambda=0.01 operating point
# (single-point R-D comparisons at one lambda are not ordered; curves are).
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

if [ -f /tmp/chain3.pid ]; then
  while kill -0 "$(cat /tmp/chain3.pid)" 2>/dev/null; do sleep 30; done
fi

for q in 2 3; do
  echo "=== train bmshj2018-$q $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci train "bmshj2018-$q" \
    --glob "$DATA/train/*.png" --steps 3000 --batch-size 8 --patch-size 256
  echo "=== eval bmshj2018-$q $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci eval "bmshj2018-$q" "$DATA/eval/*.png" \
    --csv "results/synthetic/bmshj2018-q$q.csv"
done
echo "=== chain4 done $(date -u +%H:%M:%S) ==="
