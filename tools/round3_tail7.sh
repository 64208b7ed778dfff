#!/bin/bash
# Round-3 tail queue #7 (2026-08-18 ~16:00 UTC). Runs AFTER round3_tail6.sh
# (waits on its pid). One job: measure the CHARM decode ladder on the real
# chip INCLUDING the round-3 device-coded (on-TPU rANS) path, and record
# the table in BASELINE.md.
#
# Launch detached:
#   setsid nohup bash tools/round3_tail7.sh > /tmp/r3t7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${WAIT_PID:-$(cat /tmp/r3fc.pid)}
echo "waiting for tail6 (pid $WAIT_PID) $(date -u +%H:%M:%S)"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
exec 9>/tmp/r3fc.lock
flock 9
echo "lock acquired $(date -u +%H:%M:%S)"
echo $$ > /tmp/r3fc.pid
export PYTHONUNBUFFERED=1
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export TPC_MODEL_DIR=/root/.cache/compression_tpu
DEADLINE=${DEADLINE:-$(date -u -d "2026-08-18 19:00" +%s)}
left() { echo $(( DEADLINE - $(date -u +%s) )); }
[ "$(left)" -gt 900 ] || { echo "no time left"; exit 0; }

echo "=== bench_charm (incl. device-coded path) $(date -u +%H:%M:%S) ==="
OUT=$(timeout 1800 python tools/bench_charm.py 2>/tmp/bench_charm_r3.err) || {
  echo "bench_charm failed:"; tail -5 /tmp/bench_charm_r3.err; exit 0; }
echo "$OUT"
python - "$OUT" <<'PY'
import json, sys
row = json.loads(sys.argv[1])
block = (
    "\n### CHARM decode ladder re-measured with the device-coded path "
    "(2026-08-18, trained 640-img ms2020 ckpt, batch 8 x 768x512)\n\n"
    "| decode path | img/s/chip | vs serial |\n|---|---|---|\n"
    f"| per-image serial loop | {row['serial_img_s']} | 1x |\n"
    f"| slice-batched lockstep | {row['slice_batched_img_s']} | "
    f"{row['speedup_batched']}x |\n"
    f"| + batch staggering | {row['staggered_img_s']} | "
    f"{row['speedup_staggered']}x |\n"
    f"| device-coded (on-TPU rANS, zero per-slice link syncs) | "
    f"{row['device_coded_img_s']} | {row['speedup_device']}x |\n"
)
with open("BASELINE.md", "a") as f:
    f.write(block)
print("BASELINE.md updated")
PY
git add BASELINE.md tools/bench_charm.py tools/round3_tail7.sh 2>/dev/null
git diff --cached --quiet || git commit -q -m "results: CHARM decode ladder incl. on-TPU rANS path (real chip)" || true
echo "=== tail7 done $(date -u +%H:%M:%S) ==="
