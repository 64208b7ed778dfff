#!/bin/bash
# Round-3 rebuild queue #2 (2026-08-18 02:30 UTC). The VM rebooted again and
# wiped everything outside /root/repo: all checkpoints, the dataset, the model
# cache. This queue re-establishes the chip work from scratch in strict
# VERDICT priority, committing each result row the moment it lands (two
# rebuilds this round have destroyed uncommitted /tmp and ~/.cache state).
#
# Order (rationale):
#   0. dataset regen, count-checked (the round-3 memorization trap)
#   1. bmshj2018 fresh 6000-step train -> eval + commit
#      (bench.py prefers the product checkpoint: this makes ANY later
#       driver bench run use trained-codec symbol statistics)
#   2. bench.py host+device coder with the trained ckpt (numbers of record)
#   3. ms2020 16000-step retrain on the 160-image set  (VERDICT #1)
#   4. hific-lo 20000-step rate-hinge demo             (VERDICT #3)
#   5. b2018 fixed-recipe retrain, steps sized to time (VERDICT #2 / q1 floor)
#   6. ms2020 lambda fine-tunes + mbt2018-3 curve points, if time remains
#   7. final bench; chip idle before the driver's round-end bench
#
# Launch detached:
#   setsid nohup bash tools/round3_rebuild2.sh > /tmp/r3rb2.log 2>&1 &
#   echo $! > /tmp/r3rb2.pid
set -u
cd "$(dirname "$0")/.."
# Single-instance guard + real-pid file (setsid forks: $! in the launching
# shell is NOT this bash's pid — that mistake double-ran this queue once).
exec 9>/tmp/r3rb2.lock
flock -n 9 || { echo "another rebuild queue holds the lock; exiting"; exit 1; }
echo $$ > /tmp/r3rb2.pid
export PYTHONUNBUFFERED=1
# Fresh VMs lose the editable install; make imports independent of it.
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
row_commit() { # commit result CSVs with message $1
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}

# ---- 0. dataset (count-checked; 160 train + 4 eval, frozen seeds) ----------
NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
if [ "$NTRAIN" -ne 160 ]; then
  step "regenerating dataset ($NTRAIN != 160 images present)"
  rm -rf "$DATA"
  try python tools/make_synthetic_set.py "$DATA" 160
fi
echo "dataset: $(ls "$DATA/train" | wc -l) train / $(ls "$DATA/eval" | wc -l) eval"

# ---- 1. bmshj2018 fresh product checkpoint (bench enabler + q1 row) --------
step "train bmshj2018 fresh (6000 steps)"
try timeout 7200 $TFCI train bmshj2018 --glob "$DATA/train/*.png" \
  --steps 6000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 2000
[ -f "$TPC_MODEL_DIR/bmshj2018.msgpack" ] || try python tools/promote_train_ckpt.py bmshj2018
step "eval bmshj2018"
try timeout 1800 $TFCI eval bmshj2018 "$DATA/eval/*.png" --csv $R/bmshj2018.csv
row_commit "results: fresh bmshj2018 q1 row (post-reboot retrain)"

# ---- 2. bench with the trained checkpoint ----------------------------------
step "bench.py (trained bmshj2018 checkpoint, both coder paths)"
try timeout 2400 python bench.py > /tmp/bench_r3rb2.json 2>/tmp/bench_r3rb2.log
cat /tmp/bench_r3rb2.json

# ---- 3. ms2020 fresh 16000-step retrain (VERDICT #1) ------------------------
step "train ms2020 fresh (16000 steps, 160-image dihedral-augmented set)"
try timeout 17000 $TFCI train ms2020 --glob "$DATA/train/*.png" \
  --steps 16000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 1000
[ -f "$TPC_MODEL_DIR/ms2020.msgpack" ] || try python tools/promote_train_ckpt.py ms2020
step "eval ms2020"
try timeout 1800 $TFCI eval ms2020 "$DATA/eval/*.png" --csv $R/ms2020.csv
row_commit "results: ms2020 16000-step retrain row (160-img set, dihedral aug)"

# ---- 4. hific-lo rate-hinge demonstration (VERDICT #3) ----------------------
if [ "$(left)" -gt 12000 ]; then
  step "train hific-lo fresh (20000 steps @64px; hinge demo)"
  try timeout 9500 $TFCI train hific-lo --glob "$DATA/train/*.png" \
    --steps 20000 --batch-size 8 --patch-size 64 --checkpoint-every 4000
  [ -f "$TPC_MODEL_DIR/hific-lo.msgpack" ] || try python tools/promote_train_ckpt.py hific-lo
  step "eval hific-lo"
  try timeout 1800 $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv
  row_commit "results: hific-lo 20000-step rate-hinge demo row"
fi

# ---- 5. b2018 fixed-recipe retrain, steps sized to remaining time -----------
# b2018 trains every rate point every step (the de59acb fix) at ~0.8 steps/s;
# reserve 45 min for its 4 evals + the final bench.
BUDGET=$(( $(left) - 2700 ))
if [ "$BUDGET" -gt 3600 ]; then
  STEPS=$(( BUDGET * 4 / 5 ))
  [ "$STEPS" -gt 9000 ] && STEPS=9000
  step "train b2018 fresh ($STEPS steps, fixed every-point recipe)"
  try timeout "$BUDGET" $TFCI train b2018 --glob "$DATA/train/*.png" \
    --steps "$STEPS" --batch-size 8 --patch-size 256 --lr-schedule cosine \
    --checkpoint-every 1500
  [ -f "$TPC_MODEL_DIR/b2018-gdn-128.msgpack" ] || try python tools/promote_train_ckpt.py b2018
  for q in 1 2 3 4; do
    step "eval b2018-gdn-128-$q"
    try timeout 1800 $TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" \
      --csv "$R/b2018-gdn-128-q$q.csv"
  done
  row_commit "results: b2018 retrained under fixed every-point recipe (4 rows)"
fi

# ---- 6. curve points, time permitting ---------------------------------------
for q in 2 5; do
  [ "$(left)" -gt 6000 ] || break
  name="ms2020-cc10-mse-$q"
  if [ -f "$TPC_MODEL_DIR/ms2020.msgpack" ]; then
    step "fine-tune $name from ms2020 main (2500 steps)"
    cp "$TPC_MODEL_DIR/ms2020.msgpack" "$TPC_MODEL_DIR/$name.train.msgpack"
    rm -f "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
    try timeout 3600 $TFCI train "$name" --glob "$DATA/train/*.png" \
      --steps 18500 --batch-size 8 --patch-size 256 \
      --lr 3e-5 --lr-schedule constant --checkpoint-every 2500
    [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
    step "eval $name"
    try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/ms2020-q$q.csv"
    row_commit "results: $name fine-tune curve point"
  fi
done
if [ "$(left)" -gt 6000 ]; then
  step "train mbt2018-3 fresh (6000 steps; second mbt curve point)"
  try timeout 5400 $TFCI train mbt2018-3 --glob "$DATA/train/*.png" \
    --steps 6000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
    --checkpoint-every 2000
  [ -f "$TPC_MODEL_DIR/mbt2018-3.msgpack" ] || try python tools/promote_train_ckpt.py mbt2018-3
  step "eval mbt2018-3"
  try timeout 1800 $TFCI eval mbt2018-3 "$DATA/eval/*.png" --csv $R/mbt2018-q3.csv
  row_commit "results: mbt2018 lambda=0.0075 second curve point"
fi

# ---- 7. final bench ----------------------------------------------------------
step "final bench.py"
try timeout 2400 python bench.py > /tmp/bench_r3rb2_final.json 2>/tmp/bench_r3rb2_final.log
cat /tmp/bench_r3rb2_final.json
step "rebuild queue done; chip idle with $(left)s to deadline"
