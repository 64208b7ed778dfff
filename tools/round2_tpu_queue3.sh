#!/bin/bash
# Round-2 TPU queue, stage 3: train the variable-rate b2018 family and
# evaluate every rate point from the ONE shared checkpoint
# (VERDICT #6 acceptance: >= 4 rate points through tfci compress -N).
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== train b2018-gdn-128 $(date -u +%H:%M:%S) ==="
python -m compression_tpu.cli.tfci train b2018-gdn-128 \
  --glob "$DATA/train/*.png" --steps 4000 --batch-size 8 --patch-size 256
for q in 1 2 3 4; do
  echo "=== eval b2018-gdn-128-$q $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci eval "b2018-gdn-128-$q" \
    "$DATA/eval/*.png" --csv "results/synthetic/b2018-gdn-128-q$q.csv"
done
echo "=== queue3 done $(date -u +%H:%M:%S) ==="
