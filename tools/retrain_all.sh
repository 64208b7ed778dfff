#!/bin/bash
# Round-2 R-D refresh (VERDICT item 5): train every hyperprior-family model
# to >=3000 steps on the deterministic synthetic set, then regenerate the
# results/synthetic CSVs. Sequential: one TPU process at a time.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data
[ -d $DATA/train ] || python tools/make_synthetic_set.py $DATA

train() {  # model steps
  echo "=== train $1 ($2 steps) $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci train "$1" --glob "$DATA/train/*.png" \
    --steps "$2" --batch-size 8 --patch-size 256
}
evalm() {  # model
  echo "=== eval $1 $(date -u +%H:%M:%S) ==="
  python -m compression_tpu.cli.tfci eval "$1" "$DATA/eval/*.png" \
    --csv "results/synthetic/$1.csv"
}

train bls2017 3000;   evalm bls2017
train bmshj2018 3000; evalm bmshj2018
train mbt2018 4000;   evalm mbt2018
train ms2020 4000;    evalm ms2020
echo "=== all done $(date -u +%H:%M:%S) ==="
