#!/bin/bash
# Round-2 retrain, stage 2: mbt2018 + ms2020 under the mixed-quantization
# recipe (fresh runs; the prior states were fitted with noisy conditioning),
# then bls2017. bmshj2018 (done) keeps its big-set checkpoint.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

rm -f ~/.cache/compression_tpu/{mbt2018,ms2020,bls2017}.train.msgpack

train() {
  echo "=== train $1 ($2 steps) $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci train "$1" --glob "$DATA/train/*.png" \
    --steps "$2" --batch-size 8 --patch-size 256
}
evalm() {
  echo "=== eval $1 $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci eval "$1" "$DATA/eval/*.png" \
    --csv "results/synthetic/$1.csv"
}

train mbt2018 4000;   evalm mbt2018
train ms2020 4000;    evalm ms2020
train bls2017 3000;   evalm bls2017
echo "=== all done $(date -u +%H:%M:%S) ==="
