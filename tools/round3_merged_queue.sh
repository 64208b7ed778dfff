#!/bin/bash
# Round-3 MERGED chip queue (2026-08-17 23:30 UTC). Replaces
# round3_resume_queue.sh + round3_followup.sh: the round is >14h in and may
# end at any driver tick, so (a) the order is strictly VERDICT-priority with
# the bench-enabling bmshj2018 retrain promoted ahead of the long tail, and
# (b) every eval row is git-committed the moment it lands (VM rebuilds and
# session restarts have destroyed uncommitted /tmp state twice this round).
#
# Order:
#   1. wait for the resumed ms2020 16000-step train; promote + eval + commit
#   2. bmshj2018 fresh 6000-step train  -> eval + commit   (bench ckpt; q1 row)
#   3. bench.py with the trained ckpt   -> BASELINE note + commit
#   4. hific-lo 20000-step hinge demo   -> eval + commit   (VERDICT #3)
#   5. b2018 fixed-recipe 9000-step     -> 4 evals + commit (VERDICT #2)
#   6. ms2020 lambda fine-tunes (q2/q5) -> evals + commit  (curve points)
#   7. mbt2018-3 second curve point     -> eval + commit
#   8. final bench.py
#
# Launch detached: setsid nohup bash tools/round3_merged_queue.sh > /tmp/r3merged.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
ckpt_commit() { # commit result CSVs for $1 with message $2
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$2" || true
}

# ---- 1. ms2020 main: wait, promote, eval ----------------------------------
# Wait on the trainer's pid file (pattern-matching process names is banned
# session policy and fragile anyway).
step "waiting for the ms2020 trainer to release the chip"
TRAIN_PID=$(cat /tmp/ms2020_train.pid 2>/dev/null || echo "")
while [ -n "$TRAIN_PID" ] && kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 60; done
sleep 10
try python tools/promote_train_ckpt.py ms2020 --force
step "eval ms2020"
try timeout 1800 $TFCI eval ms2020 "$DATA/eval/*.png" --csv $R/ms2020.csv
ckpt_commit ms2020 "results: ms2020 16000-step retrain eval row (160-img set, dihedral aug)"

# ---- 2. bmshj2018 fresh product checkpoint (bench enabler + q1 row) --------
step "train bmshj2018 fresh (6000 steps)"
try timeout 7200 $TFCI train bmshj2018 --glob "$DATA/train/*.png" \
  --steps 6000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 2000
[ -f "$TPC_MODEL_DIR/bmshj2018.msgpack" ] || try python tools/promote_train_ckpt.py bmshj2018
step "eval bmshj2018"
try timeout 1800 $TFCI eval bmshj2018 "$DATA/eval/*.png" --csv $R/bmshj2018.csv
ckpt_commit bmshj2018 "results: fresh bmshj2018 q1 row (replaces pareto-dominated ckpt)"

# ---- 3. bench with the trained checkpoint (BENCH_r03-grade number) ---------
step "bench.py (trained bmshj2018 checkpoint)"
try timeout 2400 python bench.py > /tmp/bench_r3_merged.json 2>/tmp/bench_r3_merged.log
cat /tmp/bench_r3_merged.json

# ---- 4. hific-lo rate-hinge demonstration (VERDICT #3) ---------------------
step "train hific-lo fresh (lambda_a hinge; 20000 steps @64px)"
rm -f "$TPC_MODEL_DIR/hific-lo.msgpack" "$TPC_MODEL_DIR/hific-lo.train.msgpack" \
      "$TPC_MODEL_DIR/hific-lo.train.msgpack.metrics.csv"
try timeout 9000 $TFCI train hific-lo --glob "$DATA/train/*.png" \
  --steps 20000 --batch-size 8 --patch-size 64 --checkpoint-every 4000
[ -f "$TPC_MODEL_DIR/hific-lo.msgpack" ] || try python tools/promote_train_ckpt.py hific-lo
step "eval hific-lo"
try timeout 1800 $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv
ckpt_commit hific-lo "results: hific-lo 20000-step rate-hinge demo row"

# ---- 5. b2018 retrain under the fixed every-point recipe (VERDICT #2) ------
step "train b2018 fresh (9000 steps, fixed recipe)"
rm -f "$TPC_MODEL_DIR/b2018-gdn-128.msgpack" \
      "$TPC_MODEL_DIR/b2018-gdn-128.train.msgpack" \
      "$TPC_MODEL_DIR/b2018-gdn-128.train.msgpack.metrics.csv"
try timeout 10800 $TFCI train b2018 --glob "$DATA/train/*.png" \
  --steps 9000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 3000
[ -f "$TPC_MODEL_DIR/b2018-gdn-128.msgpack" ] || try python tools/promote_train_ckpt.py b2018
for q in 1 2 3 4; do
  step "eval b2018-gdn-128-$q"
  try timeout 1800 $TFCI eval "b2018-gdn-128-$q" "$DATA/eval/*.png" \
    --csv "$R/b2018-gdn-128-q$q.csv"
done
ckpt_commit b2018 "results: b2018 retrained under fixed every-point recipe (4 rows)"

# ---- 6. ms2020 lambda sweep: fine-tune from the main checkpoint ------------
for q in 2 5; do
  name="ms2020-cc10-mse-$q"
  step "fine-tune $name from ms2020 main (2500 steps)"
  if [ -f "$TPC_MODEL_DIR/ms2020.msgpack" ]; then
    cp "$TPC_MODEL_DIR/ms2020.msgpack" "$TPC_MODEL_DIR/$name.train.msgpack"
    rm -f "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
    try timeout 3600 $TFCI train "$name" --glob "$DATA/train/*.png" \
      --steps 18500 --batch-size 8 --patch-size 256 \
      --lr 3e-5 --lr-schedule constant --checkpoint-every 2500
    [ -f "$TPC_MODEL_DIR/$name.msgpack" ] || try python tools/promote_train_ckpt.py "$name"
    step "eval $name"
    try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/ms2020-q$q.csv"
    ckpt_commit "$name" "results: $name fine-tune curve point"
  else
    echo "!!! no ms2020 main checkpoint; skipping $name"
  fi
done

# ---- 7. mbt2018 second curve point (lambda 0.0075 = quality 3) -------------
step "train mbt2018-3 fresh (6000 steps)"
try timeout 7200 $TFCI train mbt2018-3 --glob "$DATA/train/*.png" \
  --steps 6000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 2000
[ -f "$TPC_MODEL_DIR/mbt2018-3.msgpack" ] || try python tools/promote_train_ckpt.py mbt2018-3
step "eval mbt2018-3"
try timeout 1800 $TFCI eval mbt2018-3 "$DATA/eval/*.png" --csv $R/mbt2018-q3.csv
ckpt_commit mbt2018-3 "results: mbt2018 lambda=0.0075 second curve point"

# ---- 8. final bench ---------------------------------------------------------
step "final bench.py"
try timeout 2400 python bench.py > /tmp/bench_r3_final.json 2>/tmp/bench_r3_final.log
cat /tmp/bench_r3_final.json
step "merged queue done; chip idle"
