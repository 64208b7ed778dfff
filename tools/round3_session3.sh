#!/bin/bash
# Round-3 session-3 successor queue (2026-08-18 ~08:20 UTC).
#
# round3_full_curves.sh (r3fc) launched at 06:42 with its default 13:30 UTC
# deadline baked in; it will land ms2020 (done, 0.089 bpp / 36.96 dB),
# hific-lo (in flight) and b2018, then skip stages 4-10. This session has
# chip-time well past 13:30, so this script waits for r3fc's flock to free
# and runs the skipped stages — every row on the same 640-image set so the
# final family-ordering table has one provenance:
#
#   4.  mbt2018 fresh 10000                               (curve anchor)
#   5.  bls2017 fresh 7000                                (curve anchor)
#   5b. bmshj2018 fresh 6000                              (anchor, 640-set twin)
#   6.  bmshj2018 lambda sweep: q2 (0.0032), q3 (0.0075)  (curve points)
#   7.  bmshj2018-msssim-5 3000                           (msssim trade row)
#   8.  ms2020 fine-tune lambda points: q2, q5            (curve points)
#   9.  mbt2018-3 (lambda 0.0075)                         (curve point)
#  10.  final bench (host+device coder)
#
# Launch detached:
#   setsid nohup bash tools/round3_session3.sh > /tmp/r3s3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
# Wait (blocking) for the running full-curve queue to finish, then take over.
exec 9>/tmp/r3fc.lock
echo "waiting for r3fc lock $(date -u +%H:%M:%S)"
flock 9
echo "lock acquired $(date -u +%H:%M:%S)"
echo $$ > /tmp/r3fc.pid
export PYTHONUNBUFFERED=1
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export TPC_MODEL_DIR=/root/.cache/compression_tpu
mkdir -p "$TPC_MODEL_DIR"
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 18:45" +%s)}

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }
row_commit() {
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}
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

# ---- 0. ms2020 generalization evidence (seen vs fresh-seed) -------------------
# The 0.089 bpp / 36.96 dB headline needs the memorization question answered
# directly: eval the same checkpoint on 4 NEVER-used generator seeds and on 4
# seen training images. Generalization = the three sets (frozen eval, fresh,
# seen) agree; memorization = seen >> unseen (the round-3 signature was a 12x
# rate blow-up).
if [ -f "$TPC_MODEL_DIR/ms2020.msgpack" ] && [ "$(left)" -gt 1800 ]; then
  step "ms2020 generalization check"
  try python tools/gen_fresh_eval.py /tmp/tpc_gen 10000
  try timeout 1200 $TFCI eval ms2020 "/tmp/tpc_gen/fresh*.png" --csv $R/ms2020-genfresh.csv
  try timeout 1200 $TFCI eval ms2020 "$DATA/train/00[0-3].png" --csv $R/ms2020-genseen.csv
  row_commit "results: ms2020 generalization evidence (fresh-seed + seen-image evals)"
fi

# ---- 4-5b. family curve anchors on the 640 set -------------------------------
if [ "$(left)" -gt 7200 ]; then
  rm -f "$TPC_MODEL_DIR/mbt2018.msgpack"   # force fresh 640-set anchor
  train_promote mbt2018 10000 5400 --lr-schedule cosine --checkpoint-every 2500
  step "eval mbt2018"
  try timeout 1800 $TFCI eval mbt2018 "$DATA/eval/*.png" --csv $R/mbt2018.csv
  row_commit "results: mbt2018 fresh anchor (640-img set)"
fi
if [ "$(left)" -gt 6000 ]; then
  rm -f "$TPC_MODEL_DIR/bls2017.msgpack"
  train_promote bls2017 7000 4500 --lr-schedule cosine --checkpoint-every 2500
  step "eval bls2017"
  try timeout 1800 $TFCI eval bls2017 "$DATA/eval/*.png" --csv $R/bls2017.csv
  row_commit "results: bls2017 fresh anchor (640-img set)"
fi
if [ "$(left)" -gt 5400 ]; then
  rm -f "$TPC_MODEL_DIR/bmshj2018.msgpack"
  train_promote bmshj2018 6000 4200 --lr-schedule cosine --checkpoint-every 2000
  step "eval bmshj2018"
  try timeout 1800 $TFCI eval bmshj2018 "$DATA/eval/*.png" --csv $R/bmshj2018.csv
  row_commit "results: bmshj2018 fresh anchor (640-img set)"
fi

# ---- 6. bmshj2018 lambda sweep ------------------------------------------------
for q in 2 3; do
  [ "$(left)" -gt 4800 ] || break
  name="bmshj2018-hyperprior-mse-$q"
  rm -f "$TPC_MODEL_DIR/$name.msgpack"
  train_promote "$name" 6000 4200 --lr-schedule cosine --checkpoint-every 2000
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/bmshj2018-q$q.csv"
  row_commit "results: bmshj2018 q$q curve point (640-img set)"
done

# ---- 7. msssim trade row -------------------------------------------------------
if [ "$(left)" -gt 4200 ]; then
  name=bmshj2018-hyperprior-msssim-5
  rm -f "$TPC_MODEL_DIR/$name.msgpack"
  train_promote "$name" 3000 2700 --lr-schedule cosine --checkpoint-every 1000
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv $R/bmshj2018-msssim-q5.csv
  row_commit "results: bmshj2018-msssim-5 trade row (640-img set)"
fi

# ---- 8. ms2020 lambda fine-tunes -----------------------------------------------
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

# ---- 9. mbt2018 second curve point ---------------------------------------------
if [ "$(left)" -gt 3600 ]; then
  name="mbt2018-mean-mse-3"
  rm -f "$TPC_MODEL_DIR/$name.msgpack"
  train_promote "$name" 8000 3000 --lr-schedule cosine --checkpoint-every 2500
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv $R/mbt2018-q3.csv
  row_commit "results: mbt2018 q3 curve point (640-img set)"
fi

# ---- 10. final bench -------------------------------------------------------------
step "final bench.py (host+device)"
try timeout 2400 python bench.py > /tmp/bench_r3s3.json 2>/tmp/bench_r3s3.log
cat /tmp/bench_r3s3.json
step "session-3 queue done; chip idle with $(left)s to deadline"
