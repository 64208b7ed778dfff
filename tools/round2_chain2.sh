#!/bin/bash
# Round-2 TPU chain, part 2: retrain b2018 with the gain-ladder init (the
# flat-init run never separated its rate points), eval all four rate
# points, then the extended-training R-D ordering runs.
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

step b2018 retrain
rm -f ~/.cache/compression_tpu/b2018-gdn-128.msgpack \
      ~/.cache/compression_tpu/b2018-gdn-128.train.msgpack
python -m compression_tpu.cli.tfci train b2018-gdn-128 \
  --glob "$DATA/train/*.png" --steps 4000 --batch-size 8 --patch-size 256
for q in 1 2 3 4; do
  step "b2018 eval q$q"
  python -m compression_tpu.cli.tfci eval "b2018-gdn-128-$q" \
    "$DATA/eval/*.png" --csv "results/synthetic/b2018-gdn-128-q$q.csv"
done

extend() {
  step "extend $1 -> $2"
  python -m compression_tpu.cli.tfci train "$1" --glob "$DATA/train/*.png" \
    --steps "$2" --batch-size 8 --patch-size 256
  step "eval $1"
  python -m compression_tpu.cli.tfci eval "$1" "$DATA/eval/*.png" \
    --csv "results/synthetic/$1.csv"
}
extend ms2020 8000
extend mbt2018 8000
extend bmshj2018 6000
step all done
