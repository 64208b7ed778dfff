#!/bin/bash
# Round-3 TPU work queue (single tunneled v5e chip, exclusive):
#
#  0. Re-evaluate every surviving checkpoint on the FIXED conv path — the
#     round-3 headline finding is that the platform miscompiles 9x9/4
#     lhs-dilated convs, which corrupted bls2017/b2018 synthesis at eval
#     (bls2017's true quality: 28.8 dB, recorded as 17.5). No retraining
#     needed for those rows, only re-measurement.
#  1. ms2020 CHARM fresh long run (paper-faithful widths, LRP zero-init,
#     max_support_slices=5, cosine lr): the VERDICT r2 #1 item.
#  2. mbt2018 lambda sweep (curve points at q2/q3).
#  3. hific-lo 10k-step run (rate-hinge demonstration, VERDICT #3).
#  4. bmshj2018 msssim-trained row (VERDICT #5).
#  5. bls2017 lambda sweep.
#  6. bench.py + CHARM bench.
#  7. (stretch) ms2020 second lambda point.
#
# Launch detached:  setsid nohup bash tools/round3_queue.sh > /tmp/r3q.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${1:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED ($*) — continuing"; }

[ "$(ls "$DATA/train" 2>/dev/null | wc -l)" -ge 160 ] || python tools/make_synthetic_set.py "$DATA" 160

# ---- 0. re-evals on the fixed conv path --------------------------------
step "re-eval bls2017 (fixed conv path)"
try $TFCI eval bls2017 "$DATA/eval/*.png" --csv $R/bls2017.csv
for q in 1 2 3 4; do
  step "re-eval b2018-gdn-128-$q"
  try $TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" --csv "$R/b2018-gdn-128-q$q.csv"
done
step "re-eval bmshj2018 family + mbt2018"
try $TFCI eval bmshj2018 "$DATA/eval/*.png" --csv $R/bmshj2018.csv
try $TFCI eval bmshj2018-2 "$DATA/eval/*.png" --csv $R/bmshj2018-q2.csv
try $TFCI eval bmshj2018-3 "$DATA/eval/*.png" --csv $R/bmshj2018-q3.csv
try $TFCI eval mbt2018 "$DATA/eval/*.png" --csv $R/mbt2018.csv

# ---- 1. ms2020 fresh long run ------------------------------------------
step "ms2020 fresh 26000-step cosine run (new architecture)"
rm -f $TPC_MODEL_DIR/ms2020.msgpack $TPC_MODEL_DIR/ms2020.train.msgpack \
      $TPC_MODEL_DIR/ms2020.train.msgpack.metrics.csv
try $TFCI train ms2020 --glob "$DATA/train/*.png" --steps 26000 \
  --batch-size 8 --patch-size 256 --lr-schedule cosine --checkpoint-every 1000
step "eval ms2020"
try $TFCI eval ms2020 "$DATA/eval/*.png" --csv $R/ms2020.csv

# ---- 2. mbt2018 lambda sweep --------------------------------------------
for q in 2 3; do
  step "train mbt2018-$q (8000 steps)"
  try $TFCI train "mbt2018-$q" --glob "$DATA/train/*.png" --steps 8000 \
    --batch-size 8 --patch-size 256 --lr-schedule cosine
  step "eval mbt2018-$q"
  try $TFCI eval "mbt2018-$q" "$DATA/eval/*.png" --csv "$R/mbt2018-q$q.csv"
done

# ---- 3. hific-lo rate-hinge run -----------------------------------------
step "train hific-lo (10000 GAN steps, fresh)"
rm -f $TPC_MODEL_DIR/hific-lo.msgpack
try $TFCI train hific-lo --glob "$DATA/train/*.png" --steps 10000 \
  --batch-size 8 --patch-size 64
step "eval hific-lo"
try $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv

# ---- 4. msssim-trained row ----------------------------------------------
step "train bmshj2018-hyperprior-msssim-5 (4000 steps)"
try $TFCI train bmshj2018-hyperprior-msssim-5 --glob "$DATA/train/*.png" \
  --steps 4000 --batch-size 8 --patch-size 256
step "eval bmshj2018-hyperprior-msssim-5"
try $TFCI eval bmshj2018-hyperprior-msssim-5 "$DATA/eval/*.png" \
  --csv $R/bmshj2018-msssim-q5.csv

# ---- 5. bls2017 lambda sweep --------------------------------------------
for q in 2 5; do
  step "train bls2017-$q (7000 steps)"
  try $TFCI train "bls2017-$q" --glob "$DATA/train/*.png" --steps 7000 \
    --batch-size 8 --patch-size 256 --lr-schedule cosine
  step "eval bls2017-$q"
  try $TFCI eval "bls2017-$q" "$DATA/eval/*.png" --csv "$R/bls2017-q$q.csv"
done

# ---- 6. benches -----------------------------------------------------------
step "bench.py"
try python bench.py 2>/tmp/bench_stages_r3.log; tail -3 /tmp/bench_stages_r3.log
step "bench_charm"
try python tools/bench_charm.py

# ---- 7. stretch: ms2020 second lambda point ------------------------------
step "train ms2020-2 (14000 steps cosine)"
try $TFCI train ms2020-2 --glob "$DATA/train/*.png" --steps 14000 \
  --batch-size 8 --patch-size 256 --lr-schedule cosine --checkpoint-every 1000
step "eval ms2020-2"
try $TFCI eval ms2020-2 "$DATA/eval/*.png" --csv $R/ms2020-q2.csv

step "queue done"
