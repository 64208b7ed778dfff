#!/bin/bash
# Round-3 TAIL queue — deadline-aware replacement for round3_queue.sh steps
# 2-7.  Launched after the ms2020 fresh run + eval complete (~18:30 UTC);
# the round ends ~20:46 UTC and the driver then runs bench.py on the real
# chip, so everything here is bounded by `timeout`, training steps are
# salvaged via tools/promote_train_ckpt.py when a run hits its cap, and the
# script exits by DEADLINE_TS no matter what, leaving the tunnel free.
#
# Priorities (from VERDICT r2): the b2018 quality-floor fine-tune on the
# fixed every-rate-point recipe (#2's second half), the msssim-trained
# family row (missing #7), the hific-lo rate-hinge demonstration (#3),
# benches (#7).  The mbt2018/bls2017 lambda sweeps and the ms2020 second
# point are dropped: they do not fit the remaining chip budget and their
# families already have credible rows.
#
# Launch detached:  setsid nohup bash tools/round3_tail.sh > /tmp/r3tail.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DATA=${1:-/tmp/tpc_data}
DEADLINE_TS=${DEADLINE_TS:-1786998600}   # ~20:30 UTC — hard stop, chip free after
BENCH_RESERVE=${BENCH_RESERVE:-2100}     # seconds held back for the benches
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
left() { echo $(( DEADLINE_TS - $(date +%s) )); }
# run <budget-cap-s> <cmd...>: run under timeout min(cap, time-left minus the
# bench reserve); skip if the training window is exhausted.
run() {
  local cap=$1; shift
  local l; l=$(( $(left) - BENCH_RESERVE ))
  [ "$l" -lt 240 ] && { echo "!!! SKIP (train window exhausted): $*"; return 0; }
  [ "$l" -lt "$cap" ] && cap=$l
  timeout "$cap" "$@" || echo "!!! ENDED rc=$? ($*) — continuing"
}
# bench_run: same, but may spend the reserve (benches go last).
bench_run() {
  local cap=$1; shift
  local l; l=$(left)
  [ "$l" -lt 240 ] && { echo "!!! SKIP (deadline): $*"; return 0; }
  [ "$l" -lt "$cap" ] && cap=$l
  timeout "$cap" "$@" || echo "!!! ENDED rc=$? ($*) — continuing"
}

# ---- 1. b2018 fine-tune on the fixed recipe (VERDICT #2, de59acb) -------
# Resumes the 9000-step ladder checkpoint; every rate point now trains
# every step with the 10x prior/gain lr clock, which is exactly what the
# stuck q1 gains/priors need.
step "fine-tune b2018-gdn-128 9000 -> 10800 (fixed every-rate-point recipe)"
run 2100 $TFCI train b2018-gdn-128 --glob "$DATA/train/*.png" --steps 10800 \
  --batch-size 8 --patch-size 256 --checkpoint-every 300
run 120 python tools/promote_train_ckpt.py b2018-gdn-128
step "re-eval b2018 q1/q3 after fine-tune"
run 900 $TFCI eval b2018-gdn-128-1 "$DATA/eval/*.png" --csv $R/b2018-gdn-128-q1.csv
run 900 $TFCI eval b2018-gdn-128-3 "$DATA/eval/*.png" --csv $R/b2018-gdn-128-q3.csv

# ---- 2. msssim-trained row (VERDICT missing #7) -------------------------
step "train bmshj2018-hyperprior-msssim-5 (2500 steps, ckpt every 500)"
run 2700 $TFCI train bmshj2018-hyperprior-msssim-5 --glob "$DATA/train/*.png" \
  --steps 2500 --batch-size 8 --patch-size 256 --lr-schedule cosine \
  --checkpoint-every 500
run 120 python tools/promote_train_ckpt.py bmshj2018-hyperprior-msssim-5
step "eval bmshj2018-hyperprior-msssim-5"
run 900 $TFCI eval bmshj2018-hyperprior-msssim-5 "$DATA/eval/*.png" \
  --csv $R/bmshj2018-msssim-q5.csv

# ---- 3. hific-lo rate-hinge run (VERDICT #3) ----------------------------
step "train hific-lo (fresh, rate hinge to 0.14 target; bounded)"
rm -f $TPC_MODEL_DIR/hific-lo.msgpack $TPC_MODEL_DIR/hific-lo.train.msgpack
run 2100 $TFCI train hific-lo --glob "$DATA/train/*.png" --steps 20000 \
  --batch-size 8 --patch-size 64 --checkpoint-every 500
run 120 python tools/promote_train_ckpt.py hific-lo
step "eval hific-lo"
run 900 $TFCI eval hific-lo "$DATA/eval/*.png" --lpips --csv $R/hific-lo.csv

# ---- 4. benches (VERDICT next #7) — protected by BENCH_RESERVE ----------
step "bench.py"
bench_run 1500 python bench.py 2>/tmp/bench_stages_r3.log; tail -3 /tmp/bench_stages_r3.log
step "bench_charm"
bench_run 600 python tools/bench_charm.py

step "tail queue done; chip free"
