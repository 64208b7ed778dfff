#!/bin/bash
# Round-2 R-D refresh (VERDICT item 5): train every hyperprior-family model
# on the 160-image synthetic set (the 24-image round-1 set let the
# mean-conditioned models memorize their training latents — eval rate
# exploded ~8x through the escape path), then regenerate the
# results/synthetic CSVs. Sequential: one TPU process at a time.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big
[ -d $DATA/train ] || python tools/make_synthetic_set.py $DATA 160

# Fresh runs: the resumable train states were fitted to the old 24-image set.
rm -f ~/.cache/compression_tpu/{bls2017,bmshj2018,mbt2018,ms2020}.train.msgpack

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

train bmshj2018 3000; evalm bmshj2018
train mbt2018 4000;   evalm mbt2018
train ms2020 4000;    evalm ms2020
train bls2017 3000;   evalm bls2017
echo "=== all done $(date -u +%H:%M:%S) ==="
