#!/bin/bash
# Round-4 tunnel watcher: poll the axon tunnel with a SUBPROCESS canary
# (CLAUDE.md rule 5b — a hung in-process client can never retry) and, on
# the first pass, run the scripted on-chip queue in order. Designed to run
# under tmux for the whole session; one TPU process at a time (rule 2) —
# ALL on-chip work this round goes through this queue.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_watch}
mkdir -p "$LOG"
echo "watcher start $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform not in ("cpu",), jax.devices()
EOF
}

n=0
until probe; do
  n=$((n + 1))
  echo "probe $n failed $(date -u +%T); tunnel still out" >>"$LOG/watch.log"
  sleep 200
done
echo "TUNNEL UP after $n failed probes, $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"

# Re-confirm once after a short settle (r3 saw brief flaps), then go.
sleep 30
if ! probe; then
  echo "flap: settle re-probe failed; restarting wait" >>"$LOG/watch.log"
  exec "$0"
fi

for script in r4_onchip.sh r4_filesource.sh r4_quality.sh; do
  echo "=== queue: $script $(date -u +%F' '%T) ===" | tee -a "$LOG/watch.log"
  bash "scripts/$script" >>"$LOG/${script%.sh}.out" 2>&1
  echo "=== $script done rc=$? $(date -u +%F' '%T) ===" | tee -a "$LOG/watch.log"
done
echo "QUEUE COMPLETE $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"
