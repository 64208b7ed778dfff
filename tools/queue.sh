#!/bin/bash
# Parameterized chip-queue runner (consolidates the round3_*.sh one-shots).
#
# Usage:
#   bash tools/queue.sh queue <specfile> [DEADLINE="YYYY-MM-DD HH:MM"]
#
# Spec file lines (executed in order; '#' comments and blanks skipped):
#   dataset <n>                         — ensure /tmp/tpc_data has n train imgs
#   run <name> <steps> <timeout_s> <csv> [extra tfci-train args...]
#       — fresh run: wipe resume state, train, promote, eval to results/
#         synthetic/<csv>, commit the row. Skipped if the csv exists or
#         the deadline leaves no room.
#   report                              — regenerate RD_REPORT.md + commit
#   cmd <shell...>                      — arbitrary command (best-effort)
#
# Launch detached:
#   setsid nohup bash tools/queue.sh queue tools/round4.queue \
#     > /tmp/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
# Chip lock is taken PER QUEUE ITEM (not for the whole queue) so that
# interactive bench/validation runs can interleave between training runs:
# grab it the same way (flock /tmp/r3fc.lock) before touching the chip.
LOCK=/tmp/r3fc.lock
echo $$ > /tmp/queue.pid
export PYTHONUNBUFFERED=1
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export TPC_MODEL_DIR=${TPC_MODEL_DIR:-/root/.cache/compression_tpu}
mkdir -p "$TPC_MODEL_DIR"
DATA=${DATA:-/tmp/tpc_data}
TFCI="python -m compression_tpu.cli.tfci"
R=results/synthetic
DEADLINE=${DEADLINE:-$(date -u -d '+10 hours' +%s)}
case "$DEADLINE" in
  *[!0-9]*) DEADLINE=$(date -u -d "$DEADLINE" +%s) ;;
esac

step() { echo "=== $* $(date -u +%H:%M:%S) ==="; }
try() { "$@" || echo "!!! FAILED rc=$? ($*) — continuing"; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }
row_commit() {
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1" || true
}

q_dataset() {
  local n=$1
  local have
  have=$(ls "$DATA/train" 2>/dev/null | wc -l)
  if [ "$have" -ne "$n" ]; then
    step "regenerating dataset ($have != $n images present)"
    rm -rf "$DATA"
    try python tools/make_synthetic_set.py "$DATA" "$n"
  else
    step "dataset ok ($n train images)"
  fi
}

q_run() {
  local name=$1 steps=$2 tmo=$3 csv=$4; shift 4
  [ -f "$R/$csv" ] && { step "skip $name ($csv exists)"; return 0; }
  [ "$(left)" -gt $(( tmo + 2100 )) ] || { step "skip $name (time: $(left)s left < $tmo+2100)"; return 0; }
  step "fresh $steps-step run: $name -> $csv"
  rm -f "$TPC_MODEL_DIR/$name.train.msgpack" \
        "$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
  # No fall-through on a failed train: evaluating whatever stale
  # checkpoint happens to share the name would commit a row whose label
  # (fresh run) does not match its provenance.
  if ! train_with_stall_guard "$tmo" "$name" "$steps" "$@"; then
    step "TRAIN FAILED: $name — skipping promote/eval for this item"
    return 0
  fi
  try python tools/promote_train_ckpt.py "$name"
  step "eval $name -> $csv"
  try timeout 1800 $TFCI eval "$name" "$DATA/eval/*.png" --csv "$R/$csv"
  row_commit "results: $name $steps-step run (640-img set)"
}

# Launch `tfci train` with a stall watchdog and ONE retry. The tunneled
# chip intermittently wedges a fresh process at startup (an RPC hangs
# before the first step; observed twice on 2026-08-20: 18+ min with ~0
# CPU and no metrics row, while a relaunched identical run trains at
# 100+ img/s). Progress signal: the append-only metrics CSV (one row per
# 100 steps). No row for stall_s seconds => kill and retry once.
train_with_stall_guard() {
  local tmo=$1 name=$2 steps=$3; shift 3
  local mfile="$TPC_MODEL_DIR/$name.train.msgpack.metrics.csv"
  local stall_s=900
  local attempt rc tpid t0 age now mt
  for attempt in 1 2; do
    timeout "$tmo" $TFCI train "$name" --glob "$DATA/train/*.png" \
      --steps "$steps" --batch-size 8 --patch-size 256 \
      --lr-schedule cosine --checkpoint-every 2500 "$@" &
    tpid=$!
    t0=$(date -u +%s)
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 30
      now=$(date -u +%s)
      mt=$(stat -c %Y "$mfile" 2>/dev/null || echo "$t0")
      age=$(( now - mt ))
      if [ "$age" -gt "$stall_s" ]; then
        step "STALL: $name no metrics progress ${age}s (attempt $attempt) — killing $tpid"
        kill "$tpid" 2>/dev/null
        sleep 5
        kill -9 "$tpid" 2>/dev/null
        break
      fi
    done
    wait "$tpid"; rc=$?
    [ "$rc" -eq 0 ] && return 0
    # rc != 0: stall-kill or real failure. A metrics file with rows means
    # training was under way and died — do not silently restart a
    # half-done run (resume state was wiped for freshness); retry only
    # the never-started wedge.
    if [ -s "$mfile" ]; then
      return "$rc"
    fi
    step "retrying $name after startup wedge (attempt $attempt failed rc=$rc)"
  done
  return 1
}

q_report() {
  step "regenerate R-D report"
  try bash -c "python tools/rd_report.py > $R/RD_REPORT.md"
  git add "$R" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "results: regenerated R-D report" || true
}

with_lock() {
  (
    exec 9>"$LOCK"
    flock 9
    "$@"
  )
}

run_queue() {
  local spec=$1
  local verb rest tok
  while IFS= read -r line || [ -n "$line" ]; do
    case "$line" in
      ''|'#'*) continue ;;
    esac
    # Split without pathname expansion: `read -a` word-splits only, so
    # run-args may carry globs (e.g. --rate-probe-glob /data/*.png) as
    # plain unquoted tokens and they reach q_run verbatim. `cmd` keeps
    # its raw remainder for bash -c (quotes interpreted there).
    read -r verb rest <<< "$line"
    case "$verb" in
      dataset) with_lock q_dataset "$rest" ;;
      run)     read -r -a tok <<< "$rest"; with_lock q_run "${tok[@]}" ;;
      report)  q_report ;;
      cmd)     step "cmd: $rest"; with_lock try bash -c "$rest" ;;
      *)       echo "!!! unknown spec verb: $verb" ;;
    esac
  done < "$spec"
  step "queue $spec done"
}

case "${1:-}" in
  queue) run_queue "$2" ;;
  *) echo "usage: bash tools/queue.sh queue <specfile>"; exit 2 ;;
esac
