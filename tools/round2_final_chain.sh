#!/bin/bash
# Round-2 consolidated TPU chain (serial; one device process at a time):
#   1. HiFiC-lo GAN training at 64px (the 128px recipe is ~8 s/step on the
#      tunneled chip) + eval row with LPIPS column
#   2. CHARM decode benchmark (serial vs slice-batched vs staggered)
#   3. toy-sources NTC-vs-ECVQ R-D sweep
#   4. b2018 variable-rate training + all four rate-point evals
#   5. extended training for the R-D ordering (mbt2018/ms2020 -> 8000,
#      bmshj2018 -> 6000) + final evals
set -e
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/tmp/tpc_data_big

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

step hific-lo train
rm -f ~/.cache/compression_tpu/hific-lo.msgpack
python -m compression_tpu.cli.tfci train hific-lo --steps 1200 \
  --batch-size 8 --patch-size 64 --glob "$DATA/train/*.png"
step hific-lo eval
python -m compression_tpu.cli.tfci eval hific-lo "$DATA/eval/*.png" \
  --lpips --csv results/synthetic/hific-lo.csv

step charm bench
python tools/bench_charm.py 2>/tmp/bench_charm_stages.log || true
tail -2 /tmp/bench_charm_stages.log || true

step toy sweep
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

step b2018 train
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
