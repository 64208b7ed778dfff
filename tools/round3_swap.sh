#!/bin/bash
# Watches the round-3 queue (/tmp/r3q.pid): once it finishes the ms2020
# fresh run + eval (i.e. prints the "train mbt2018-2" step marker, whose
# lambda-sweep trainings do NOT fit the remaining round budget), kills the
# queue's process group and launches the deadline-aware tail queue
# (tools/round3_tail.sh) in its place.  A hard SWAP_DEADLINE bounds the
# wait in case ms2020's eval overruns.
#
# Launch detached:  setsid nohup bash tools/round3_swap.sh > /tmp/r3swap.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
SWAP_DEADLINE=${SWAP_DEADLINE:-1786995600}   # ~19:40 UTC

QPID=$(cat /tmp/r3q.pid 2>/dev/null || echo "")
while [ -n "$QPID" ] && ps -p "$QPID" >/dev/null 2>&1; do
  grep -q "=== train mbt2018-2" /tmp/r3q.log 2>/dev/null && break
  [ "$(date +%s)" -ge "$SWAP_DEADLINE" ] && { echo "swap deadline hit"; break; }
  sleep 60
done

if [ -n "$QPID" ] && ps -p "$QPID" >/dev/null 2>&1; then
  echo "killing queue group -$QPID $(date -u +%H:%M:%S)"
  kill -TERM -- "-$QPID" 2>/dev/null
  sleep 15
  kill -KILL -- "-$QPID" 2>/dev/null
  sleep 15
fi

echo "launching tail queue $(date -u +%H:%M:%S)"
setsid nohup bash tools/round3_tail.sh > /tmp/r3tail.log 2>&1 &
echo $! > /tmp/r3tail.pid
