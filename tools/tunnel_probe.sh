#!/bin/bash
# Probes the tunneled TPU every 10 min and logs when it becomes reachable.
# Background diagnostic for tunnel-stall incidents (relay wedged on a
# non-draining stdout pipe after a session restart): all in-VM state is
# intact, so recovery is just the outer reader resuming — this notices.
set -u
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TUNNEL OK"
  else
    echo "$(date -u +%H:%M:%S) tunnel down"
  fi
  sleep 600
done
