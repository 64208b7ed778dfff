#!/bin/bash
# Reproduces every table in results/ from scratch on one TPU chip
# (the consolidated, de-duplicated form of the round-2 session chains).
# Total budget: ~5-6 h on a tunneled v5e-1; faster on local chips.
#
#   bash tools/reproduce_results.sh [DATA_DIR]
set -e
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
DATA=${1:-/tmp/tpc_data_big}
TFCI="python -m compression_tpu.cli.tfci"

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

[ "$(ls "$DATA/train" 2>/dev/null | wc -l)" -ge 160 ] || python tools/make_synthetic_set.py "$DATA" 160

train_eval() {  # name steps [eval_csv_name]
  step "train $1 ($2 steps)"
  $TFCI train "$1" --glob "$DATA/train/*.png" --steps "$2" \
    --batch-size 8 --patch-size 256
  step "eval $1"
  $TFCI eval "$1" "$DATA/eval/*.png" --csv "results/synthetic/${3:-$1}.csv"
}

# R-D table (lambda=0.01 main points + bmshj low-rate points).
train_eval bls2017 3000
train_eval bmshj2018 6000
train_eval mbt2018 8000
train_eval ms2020 14000
train_eval bmshj2018-2 6000 bmshj2018-q2
train_eval bmshj2018-3 3000 bmshj2018-q3

# Variable-rate family: ONE checkpoint, four rate points.
step "train b2018-gdn-128 (9000 steps)"
$TFCI train b2018-gdn-128 --glob "$DATA/train/*.png" --steps 9000 \
  --batch-size 8 --patch-size 256
for q in 1 2 3 4; do
  step "eval b2018-gdn-128-$q"
  $TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" \
    --csv "results/synthetic/b2018-gdn-128-q$q.csv"
done

# HiFiC smoke training (64px: the 128px G+D+VGG step is ~8 s/chip here).
step "train hific-lo (1200 GAN steps)"
$TFCI train hific-lo --glob "$DATA/train/*.png" --steps 1200 \
  --batch-size 8 --patch-size 64
step "eval hific-lo"
$TFCI eval hific-lo "$DATA/eval/*.png" --lpips \
  --csv results/synthetic/hific-lo.csv

# Throughput benches.
step bench
python bench.py 2>/tmp/bench_stages.log; tail -3 /tmp/bench_stages.log
step charm bench
python tools/bench_charm.py

# Toy sources: NTC vs entropy-constrained VQ.
step toy sweep
python - <<'EOF'
from compression_tpu.models import toy_sources as toy
toy.compare_ntc_vq(
    toy.banana, lambdas=(0.3, 1.0, 3.0, 10.0),
    csv_path="results/toy_sources/banana_ntc_vs_ecvq.csv",
    ntc_steps=2500, vq_steps=300, num_codewords=256,
)
EOF
step done
