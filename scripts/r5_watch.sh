#!/bin/bash
# Round-5 tunnel watcher: same design as r4_watch.sh (subprocess canary,
# NOT a bare jax.devices() — rule 5b), firing the round-5 queue on
# recovery. Stop cleanly with: PIDFILE=/tmp/r5_watch.pid bash scripts/r4_stop.sh
# (MUST happen before the driver's end-of-round bench.py if still active —
# one TPU process at a time, rule 2).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5_watch}
mkdir -p "$LOG"
echo $$ >/tmp/r5_watch.pid
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

# VERDICT r4 rank order: scoreboard+profiling+pricing+serve, then the
# host→device boundary, then training-quality evidence, then the knob A/B.
for script in r5_onchip.sh r4_filesource.sh r4_quality.sh r5_quality_ab.sh; do
  echo "=== queue: $script $(date -u +%F' '%T) ===" | tee -a "$LOG/watch.log"
  bash "scripts/$script" >>"$LOG/${script%.sh}.out" 2>&1
  echo "=== $script done rc=$? $(date -u +%F' '%T) ===" | tee -a "$LOG/watch.log"
done
echo "QUEUE COMPLETE $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"
