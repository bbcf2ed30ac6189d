#!/bin/bash
# Restart-on-hang supervisor for on-chip training runs.
#
# The TPU tunnel can wedge mid-run (observed twice in round 1/2: a device
# fetch blocks forever and SIGTERM can't unwind it). Recovery recipe:
#   1. train with --watchdog_exit so a hung step dumps stacks and dies;
#   2. this loop probes the chip until it responds, then restarts the
#      trainer, which auto-resumes from the latest orbax checkpoint.
#
# Usage: scripts/run_supervised_train.sh <train command...>
# Exits 0 when the wrapped command completes normally.
set -u
MAX_ATTEMPTS=${MAX_ATTEMPTS:-40}
PROBE_TRIES=${PROBE_TRIES:-120}

probe_chip() {
  for _ in $(seq 1 "$PROBE_TRIES"); do
    if timeout 180 python -c \
      "import jax; jax.numpy.zeros(8).block_until_ready(); print('chip ok:', jax.devices()[0])"; then
      return 0
    fi
    echo "[supervisor] chip probe failed; retrying in 60s" >&2
    sleep 60
  done
  return 1
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  if ! probe_chip; then
    echo "[supervisor] chip never came back; giving up" >&2
    exit 2
  fi
  # Let the tunnel settle after the probe client disconnects — immediate
  # reconnects have been observed to wedge backend init (the axon server
  # appears to admit one client at a time and takes a while to reap a
  # disconnected session).
  sleep "${SETTLE_S:-90}"
  echo "[supervisor] attempt $attempt: $*" >&2
  "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[supervisor] run completed cleanly" >&2
    exit 0
  fi
  echo "[supervisor] attempt $attempt exited rc=$rc; restarting from latest checkpoint in 30s" >&2
  sleep 30
done
echo "[supervisor] attempt budget exhausted" >&2
exit 1
