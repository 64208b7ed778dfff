#!/bin/bash
# Round-3 resumed-session chip queue (2026-08-17, post-VM-rebuild): runs when
# the ms2020 fresh retrain releases the chip. All checkpoints were wiped by
# the rebuild, so every row here is trained tonight. Order = VERDICT r2
# priority: ms2020 eval (headline), hific-lo rate-hinge demo at the fixed
# lambda_a, ms2020 lambda-sweep fine-tunes for the curve-vs-curve ordering,
# an mbt2018 second point, then benches.
#
# Launch detached AFTER the main ms2020 train has been started:
#   setsid nohup bash tools/round3_resume_queue.sh > /tmp/r3resume.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }

# ---- 0. wait for the ms2020 main run to exit ------------------------------
step "waiting for the ms2020 trainer to release the chip"
while pgrep -f "tfci train ms2020 " >/dev/null 2>&1; do sleep 60; done
sleep 10
if [ ! -f "$TPC_MODEL_DIR/ms2020.msgpack" ]; then
  step "promoting periodic ms2020 checkpoint (run was cut)"
  try python tools/promote_train_ckpt.py ms2020
fi

# ---- 1. ms2020 eval (VERDICT #1 headline row) -----------------------------
step "eval ms2020"
try timeout 1800 $TFCI eval ms2020 "$DATA/eval/*.png" --csv $R/ms2020.csv

# ---- 2. hific-lo rate-hinge demonstration (VERDICT #3) --------------------
step "train hific-lo fresh (lambda_a=1.0 hinge; 20000 steps @64px)"
rm -f "$TPC_MODEL_DIR/hific-lo.msgpack" "$TPC_MODEL_DIR/hific-lo.train.msgpack" \
      "$TPC_MODEL_DIR/hific-lo.train.msgpack.metrics.csv"
try timeout 7200 $TFCI train hific-lo --glob "$DATA/train/*.png" \
  --steps 20000 --batch-size 8 --patch-size 64 --checkpoint-every 4000
[ -f "$TPC_MODEL_DIR/hific-lo.msgpack" ] || try python tools/promote_train_ckpt.py hific-lo
step "eval hific-lo"
try timeout 1800 $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv

# ---- 3. ms2020 lambda sweep: fine-tune from the main checkpoint -----------
# ms2020-cc10-mse-2 (lambda 0.0032) and -5 (lambda 0.03): warm-start from the
# 16000-step main params (params-only resume, fresh opt), 2500 steps each at
# a decayed constant lr. Gives the 3-point CHARM curve for the ordering
# comparison against bmshj2018's committed 3-point curve.
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
  else
    echo "!!! no ms2020 main checkpoint; skipping $name"
  fi
done

# ---- 4. mbt2018 second curve point (lambda 0.0075 = quality 3) ------------
step "train mbt2018-3 fresh (6000 steps)"
try timeout 5400 $TFCI train mbt2018-3 --glob "$DATA/train/*.png" \
  --steps 6000 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 2000
[ -f "$TPC_MODEL_DIR/mbt2018-3.msgpack" ] || try python tools/promote_train_ckpt.py mbt2018-3
step "eval mbt2018-3"
try timeout 1800 $TFCI eval mbt2018-3 "$DATA/eval/*.png" --csv $R/mbt2018-q3.csv

# ---- 5. benches (numbers of record for BASELINE.md) -----------------------
step "bench.py (auto: host + device, headline = faster)"
try timeout 1800 python bench.py 2>/tmp/bench_r3_resume.log
step "queue done; chip idle"
