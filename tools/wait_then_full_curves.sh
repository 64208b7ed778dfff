#!/bin/bash
# Waits for the manual ms2020 trainer (pid in /tmp/ms2020_manual.pid or $1)
# to exit, then relaunches the round-3 full-curve queue. The queue's stage 1
# (ms2020 40000-step train) becomes a no-op resume that saves the eval
# checkpoint and proceeds to eval + the remaining stages.
#
# Launch detached:
#   setsid nohup bash tools/wait_then_full_curves.sh <trainer_pid> \
#     > /tmp/wait_fc.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PID=${1:-$(cat /tmp/ms2020_manual.pid 2>/dev/null || echo "")}
if [ -z "$PID" ]; then echo "no trainer pid given"; exit 1; fi
echo "waiting on trainer pid $PID ($(date -u +%H:%M:%S))"
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "trainer exited ($(date -u +%H:%M:%S)); launching full-curve queue"
setsid nohup bash tools/round3_full_curves.sh > /tmp/r3fc.log 2>&1 &
echo "queue launched"
