#!/bin/bash
# Round-2 TPU chain, part 3: extend b2018 (rate separation needs the
# per-quality priors to adapt to the gain ladder) and re-eval all points.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

if [ -f /tmp/chain.pid ]; then
  while kill -0 "$(cat /tmp/chain.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== b2018 extend -> 9000 $(date -u +%H:%M:%S) ==="
python -m compression_tpu.cli.tfci train b2018-gdn-128 \
  --glob "$DATA/train/*.png" --steps 9000 --batch-size 8 --patch-size 256
for q in 1 2 3 4; do
  echo "=== b2018 eval q$q $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci eval "b2018-gdn-128-$q" \
    "$DATA/eval/*.png" --csv "results/synthetic/b2018-gdn-128-q$q.csv"
done
echo "=== chain3 done $(date -u +%H:%M:%S) ==="
