#!/bin/bash
# Round-2 TPU chain, part 5 (remaining chip budget): push the two models
# whose R-D points were still moving — ms2020 (14k steps) and the
# matched-rate bmshj2018 low-rate point (6k) — then a final bench pass.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

step ms2020 extend 14000
python -m compression_tpu.cli.tfci train ms2020 --glob "$DATA/train/*.png" \
  --steps 14000 --batch-size 8 --patch-size 256
step ms2020 eval
python -m compression_tpu.cli.tfci eval ms2020 "$DATA/eval/*.png" \
  --csv results/synthetic/ms2020.csv

step bmshj2018-2 extend 6000
python -m compression_tpu.cli.tfci train bmshj2018-2 \
  --glob "$DATA/train/*.png" --steps 6000 --batch-size 8 --patch-size 256
step bmshj2018-2 eval
python -m compression_tpu.cli.tfci eval bmshj2018-2 "$DATA/eval/*.png" \
  --csv results/synthetic/bmshj2018-q2.csv

step final bench
python bench.py 2>/tmp/bench_final_stages.log || true
tail -3 /tmp/bench_final_stages.log || true
step chain5 done
