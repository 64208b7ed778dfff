#!/bin/bash
# Round-3 full-curve queue (2026-08-18 ~04:00 UTC). Supersedes the tail of
# rebuild queue #3: the uint8-on-the-wire trainer (322995a) raised training
# throughput ~10x on today's tunnel (0.9 -> 9 steps/s for bmshj2018), so the
# remaining chip-day funds what VERDICT r2 actually asked for — per-family
# lambda CURVES at converged schedules on one consistent dataset:
#
#   1. ms2020 CHARM 40000-step cosine retrain            (VERDICT #1: converge)
#   2. hific-lo 20000-step rate-hinge demo               (VERDICT #3)
#   3. b2018 9000-step fixed every-point recipe          (VERDICT #2 / q1 floor)
#   4. mbt2018 fresh 10000                                (curve anchor)
#   5. bls2017 fresh 7000                                 (curve anchor)
#   6. bmshj2018 lambda sweep: q2 (0.0032), q3 (0.0075)   (curve points)
#   7. bmshj2018-msssim-5 3000                            (msssim trade row)
#   8. ms2020 fine-tune lambda points: q2, q5             (curve points)
#   9. mbt2018-3 (lambda 0.0075)                          (curve point)
#  10. final bench (host+device coder)
#
# All rows this queue writes are 640-image-set provenance (the 114M-param
# CHARM memorized 24 images in round 3 and plausibly could 160; 640 x 8
# dihedral variants makes that failure mode implausible). Every row is
# git-committed the moment it lands.
#
# Launch detached:
#   setsid nohup bash tools/round3_full_curves.sh > /tmp/r3fc.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
exec 9>/tmp/r3fc.lock
flock -n 9 || { echo "another full-curve queue holds the lock; exiting"; exit 1; }
echo $$ > /tmp/r3fc.pid
export PYTHONUNBUFFERED=1
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export TPC_MODEL_DIR=/root/.cache/compression_tpu
mkdir -p "$TPC_MODEL_DIR"
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic
DEADLINE=$(date -u -d "2026-08-18 13:30" +%s)

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }
row_commit() {
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}
# train <name> <steps> <timeout> <extra args...>: train, promote if cut.
train_promote() {
  local name=$1 steps=$2 tmo=$3; shift 3
  step "train $name ($steps steps)"
  try timeout "$tmo" $TFCI train "$name" --glob "$DATA/train/*.png" \
    --steps "$steps" --batch-size 8 --patch-size 256 "$@"
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
}

NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
if [ "$NTRAIN" -ne 640 ]; then
  step "regenerating dataset ($NTRAIN != 640 images present)"
  rm -rf "$DATA"
  try python tools/make_synthetic_set.py "$DATA" 640
fi

# ---- 1. ms2020 CHARM, converging schedule (VERDICT #1) ----------------------
train_promote ms2020 40000 16200 --lr-schedule cosine --checkpoint-every 2000
step "eval ms2020"
try timeout 1800 $TFCI eval ms2020 "$DATA/eval/*.png" --csv $R/ms2020.csv
row_commit "results: ms2020 40000-step cosine retrain (640-img set)"

# ---- 2. hific-lo rate-hinge demo (VERDICT #3) -------------------------------
if [ "$(left)" -gt 10800 ]; then
  train_promote hific-lo 20000 9000 --patch-size 64 --checkpoint-every 4000
  step "eval hific-lo"
  try timeout 1800 $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv
  row_commit "results: hific-lo 20000-step rate-hinge demo row (640-img set)"
fi

# ---- 3. b2018 fixed every-point recipe (VERDICT #2) -------------------------
if [ "$(left)" -gt 9000 ]; then
  train_promote b2018 9000 7200 --lr-schedule cosine --checkpoint-every 2000
  for q in 1 2 3 4; do
    step "eval b2018-gdn-128-$q"
    try timeout 1800 $TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" \
      --csv "$R/b2018-gdn-128-q$q.csv"
  done
  row_commit "results: b2018 fixed-recipe retrain, 4 rows (640-img set)"
fi

# ---- 4-5. family curve anchors on the 640 set -------------------------------
if [ "$(left)" -gt 7200 ]; then
  train_promote mbt2018 10000 5400 --lr-schedule cosine --checkpoint-every 2500
  step "eval mbt2018"
  try timeout 1800 $TFCI eval mbt2018 "$DATA/eval/*.png" --csv $R/mbt2018.csv
  row_commit "results: mbt2018 fresh anchor (640-img set)"
fi
if [ "$(left)" -gt 5400 ]; then
  train_promote bls2017 7000 4500 --lr-schedule cosine --checkpoint-every 2500
  step "eval bls2017"
  try timeout 1800 $TFCI eval bls2017 "$DATA/eval/*.png" --csv $R/bls2017.csv
  row_commit "results: bls2017 fresh anchor (640-img set)"
fi

# ---- 6. bmshj2018 lambda sweep ----------------------------------------------
for q in 2 3; do
  [ "$(left)" -gt 4800 ] || break
  name="bmshj2018-hyperprior-mse-$q"
  train_promote "$name" 6000 4200 --lr-schedule cosine --checkpoint-every 2000
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/bmshj2018-q$q.csv"
  row_commit "results: bmshj2018 q$q curve point (640-img set)"
done

# ---- 7. msssim trade row -----------------------------------------------------
if [ "$(left)" -gt 4200 ]; then
  name=bmshj2018-hyperprior-msssim-5
  train_promote "$name" 3000 2700 --lr-schedule cosine --checkpoint-every 1000
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv $R/bmshj2018-msssim-q5.csv
  row_commit "results: bmshj2018-msssim-5 trade row (640-img set)"
fi

# ---- 8. ms2020 lambda fine-tunes ---------------------------------------------
for q in 2 5; do
  [ "$(left)" -gt 4500 ] || break
  name="ms2020-cc10-mse-$q"
  if [ -f "$TPC_MODEL_DIR/ms2020.msgpack" ]; then
    step "fine-tune $name from ms2020 main (4000 steps)"
    cp "$TPC_MODEL_DIR/ms2020.msgpack" "$TPC_MODEL_DIR/$name.train.msgpack"
    rm -f "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
    try timeout 3600 $TFCI train "$name" --glob "$DATA/train/*.png" \
      --steps 44000 --batch-size 8 --patch-size 256 \
      --lr 3e-5 --lr-schedule constant --checkpoint-every 2000
    [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
    step "eval $name"
    try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/ms2020-q$q.csv"
    row_commit "results: $name fine-tune curve point (640-img set)"
  fi
done

# ---- 9. mbt2018 second curve point -------------------------------------------
if [ "$(left)" -gt 3600 ]; then
  name="mbt2018-mean-mse-3"
  train_promote "$name" 8000 3000 --lr-schedule cosine --checkpoint-every 2500
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv $R/mbt2018-q3.csv
  row_commit "results: mbt2018 q3 curve point (640-img set)"
fi

# ---- 10. final bench ----------------------------------------------------------
step "final bench.py (host+device)"
try timeout 2400 python bench.py > /tmp/bench_r3fc.json 2>/tmp/bench_r3fc.log
cat /tmp/bench_r3fc.json
step "full-curve queue done; chip idle with $(left)s to deadline"
