#!/bin/bash
# Round-2 TPU queue, stage 2: after bench + hific (round2_tpu_queue.sh),
# run the CHARM decode benchmark and the toy-sources NTC-vs-ECVQ sweep.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

if [ -f /tmp/queue.pid ]; then
  while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== charm bench $(date -u +%H:%M:%S) ==="
python tools/bench_charm.py 2>/tmp/bench_charm_stages.log || true
tail -3 /tmp/bench_charm_stages.log || true

echo "=== toy sources NTC vs ECVQ $(date -u +%H:%M:%S) ==="
python - <<'EOF'
from compression_tpu.models import toy_sources as toy
rows = toy.compare_ntc_vq(
    toy.banana, lambdas=(0.3, 1.0, 3.0, 10.0),
    csv_path="results/toy_sources/banana_ntc_vs_ecvq.csv",
    ntc_steps=2500, vq_steps=300, num_codewords=256,
)
for r in rows:
    print(r)
EOF
echo "=== queue2 done $(date -u +%H:%M:%S) ==="
