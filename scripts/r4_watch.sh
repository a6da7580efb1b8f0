#!/bin/bash
# Round-4 tunnel watcher: poll the axon tunnel with a SUBPROCESS canary
# (CLAUDE.md rule 5b — a hung in-process client can never retry) and, on
# the first pass, run the scripted on-chip queue in order. Designed to run
# under nohup/tmux for the whole session; one TPU process at a time
# (rule 2) — ALL on-chip work this round goes through this queue.
#
# The gate is utils/doctor.device_probe — a tiny jit + compile + execute +
# HOST FETCH in a subprocess — NOT a bare jax.devices() listing, which
# passes during the rule-5 compile-helper wedge (devices list fine, every
# jit hangs) and would launch hours of queue into a wedged helper.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_watch}
mkdir -p "$LOG"
echo "watcher start $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
from action_conditioned_gans_tpu.utils.doctor import device_probe
r = device_probe(120)
assert r.get("ok"), r
assert r.get("platform") not in (None, "cpu"), r
EOF
}

n=0
while true; do
  if probe; then
    echo "probe passed $(date -u +%T); settling 30s" | tee -a "$LOG/watch.log"
    sleep 30
    if probe; then
      echo "TUNNEL UP after $n failed probes, $(date -u +%F' '%T)" \
        | tee -a "$LOG/watch.log"
      break
    fi
    echo "flap: settle re-probe failed; resuming wait" >>"$LOG/watch.log"
  fi
  n=$((n + 1))
  echo "probe $n failed $(date -u +%T); tunnel still out" >>"$LOG/watch.log"
  sleep 200
done

for script in r4_onchip.sh r4_filesource.sh r4_quality.sh; do
  echo "=== queue: $script $(date -u +%F' '%T) ===" | tee -a "$LOG/watch.log"
  bash "scripts/$script" >>"$LOG/${script%.sh}.out" 2>&1
  echo "=== $script done rc=$? $(date -u +%F' '%T) ===" | tee -a "$LOG/watch.log"
done
echo "QUEUE COMPLETE $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"
