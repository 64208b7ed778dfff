#!/bin/bash
# Round-3 session-3 queue, v2 (2026-08-18 ~08:30 UTC).
#
# v1 assumed r3fc (round3_full_curves.sh) would deadline-skip its stages 4-10;
# in fact the uint8-wire trainer runs hific at ~200 img/s and r3fc will finish
# everything well before its 13:30 deadline. So this queue is now
# (a) an idempotent GAP-FILLER — any anchor r3fc somehow failed to land is
#     retrained (guarded on the promoted msgpack existing), and
# (b) EXTENSIONS that r3fc does not attempt:
#       0.  ms2020 generalization evidence (fresh-seed + seen-image evals)
#       E1. bmshj2018 main anchor on the 640 set (r3fc only does q2/q3)
#       E2. mbt2018 extended 25000-step run (family-ordering middle link:
#           literature says mbt2018 >= bmshj2018; the 10k anchor may undertrain)
#       E3. bmshj2018 q1 low-rate curve point
#       E4. hific-lo continuation while its eval bpp > 2x the 0.14 target
#       E5. final bench (throughput + latency modes)
#
# Launch detached:
#   setsid nohup bash tools/round3_session3.sh > /tmp/r3s3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
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
# Gap-filler: train+eval only when r3fc did not already land the checkpoint.
anchor_if_missing() {
  local name=$1 steps=$2 tmo=$3 csv=$4; shift 4
  [ -f "$TPC_MODEL_DIR/$name.msgpack" ] && return 0
  [ "$(left)" -gt $(( tmo + 1800 )) ] || return 0
  train_promote "$name" "$steps" "$tmo" "$@"
  step "eval $name"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/$csv"
  row_commit "results: $name gap-fill anchor (640-img set)"
}

NTRAIN=$(ls "$DATA/train" 2>/dev/null | wc -l)
if [ "$NTRAIN" -ne 640 ]; then
  step "regenerating dataset ($NTRAIN != 640 images present)"
  rm -rf "$DATA"
  try python tools/make_synthetic_set.py "$DATA" 640
fi

# ---- 0. ms2020 generalization evidence (seen vs fresh-seed) -------------------
if [ -f "$TPC_MODEL_DIR/ms2020.msgpack" ] && [ "$(left)" -gt 1800 ]; then
  step "ms2020 generalization check"
  try python tools/gen_fresh_eval.py /tmp/tpc_gen 10000
  try timeout 1200 $TFCI eval ms2020 "/tmp/tpc_gen/fresh*.png" --csv $R/ms2020-genfresh.csv
  try timeout 1200 $TFCI eval ms2020 "$DATA/train/00[0-3].png" --csv $R/ms2020-genseen.csv
  row_commit "results: ms2020 generalization evidence (fresh-seed + seen-image evals)"
fi

# ---- gap-fill anything r3fc failed to land ------------------------------------
anchor_if_missing mbt2018 10000 5400 mbt2018.csv --lr-schedule cosine --checkpoint-every 2500
anchor_if_missing bls2017 7000 4500 bls2017.csv --lr-schedule cosine --checkpoint-every 2500
anchor_if_missing bmshj2018-hyperprior-mse-2 6000 4200 bmshj2018-q2.csv --lr-schedule cosine --checkpoint-every 2000
anchor_if_missing bmshj2018-hyperprior-mse-3 6000 4200 bmshj2018-q3.csv --lr-schedule cosine --checkpoint-every 2000
anchor_if_missing bmshj2018-hyperprior-msssim-5 3000 2700 bmshj2018-msssim-q5.csv --lr-schedule cosine --checkpoint-every 1000
anchor_if_missing mbt2018-mean-mse-3 8000 3000 mbt2018-q3.csv --lr-schedule cosine --checkpoint-every 2500

# ---- E1. bmshj2018 main anchor on the 640 set ---------------------------------
anchor_if_missing bmshj2018 6000 4200 bmshj2018.csv --lr-schedule cosine --checkpoint-every 2000

# ---- E2. mbt2018 extended run (ordering middle link) ---------------------------
if [ "$(left)" -gt 9000 ]; then
  name=mbt2018
  step "mbt2018 extended: 25000-step fresh cosine run"
  rm -f "$TPC_MODEL_DIR/$name.train.msgpack" "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
  train_promote "$name" 25000 7200 --lr-schedule cosine --checkpoint-every 2500
  step "eval mbt2018 (extended)"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv $R/mbt2018-long.csv
  row_commit "results: mbt2018 extended 25000-step run (640-img set)"
fi

# ---- E3. bmshj2018 q1 low-rate curve point -------------------------------------
if [ "$(left)" -gt 5400 ]; then
  name=bmshj2018-hyperprior-mse-1
  anchor_if_missing "$name" 6000 4200 bmshj2018-q1.csv --lr-schedule cosine --checkpoint-every 2000
fi

# ---- E4. hific-lo continuation toward the 0.14 bpp target ----------------------
hific_bpp() {
  python - <<'EOF'
import csv, sys
try:
    rows = list(csv.reader(open("results/synthetic/hific-lo.csv")))
    print(rows[-1][1])
except Exception:
    print("999")
EOF
}
for round in 1 2; do
  [ "$(left)" -gt 7200 ] || break
  BPP=$(hific_bpp)
  ok=$(python -c "print(1 if float('$BPP') > 0.28 else 0)")
  [ "$ok" = "1" ] || break
  CUR=$(python -c "
import flax.serialization as fs
raw = fs.msgpack_restore(open('$TPC_MODEL_DIR/hific-lo.train.msgpack','rb').read())
print(int(raw.get('step', 0)))
" 2>/dev/null || echo 20000)
  TARGET=$(( CUR + 10000 ))
  step "hific-lo continuation round $round: bpp=$BPP > 0.28, training to $TARGET"
  try timeout 5400 $TFCI train hific-lo --glob "$DATA/train/*.png" \
    --steps "$TARGET" --batch-size 8 --patch-size 256 --patch-size 64 \
    --checkpoint-every 4000
  try python tools/promote_train_ckpt.py hific-lo --force
  step "eval hific-lo (continued)"
  try timeout 1800 $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv
  row_commit "results: hific-lo continuation to $TARGET steps (rate-target push)"
done

# ---- E5. final bench --------------------------------------------------------------
step "final bench.py (throughput mode)"
try timeout 2400 python bench.py > /tmp/bench_r3s3.json 2>/tmp/bench_r3s3.log
cat /tmp/bench_r3s3.json
step "session-3 queue done; chip idle with $(left)s to deadline"
