#!/bin/bash
# Round-5 follow-up legs: retry what the main r5 queue could not land.
#
# 1. xplane anatomies for config3/config4 (VERDICT r4 next-step 2). The
#    r5_onchip.sh legs ran `--steps 40` against presets whose
#    steps_per_call (32/16) put the 3-dispatch profiler warmup past the
#    run's end — the capture silently no-op'd (fixed in train/loop.py with
#    a clamp + flush; regression test in tests/test_e2e.py). Here we use
#    steps_per_call=8 with --steps 48 so the warmup (24) + one traced
#    dispatch (8) + stop boundary all fit cleanly. The per-op anatomy of
#    the fused step does not depend on k (same step scanned k times).
# 2. Compile-cache probe retry (VERDICT r4 next-step 1): both r5 attempts
#    were watchdog-killed by a tunnel flap mid-run, though /tmp/r5_cc shows
#    executables DID serialize. cold-vs-warm compile_s decides whether
#    ACGAN_COMPILE_CACHE_DIR becomes a driver-facing default.
#
# Invoked as `r5_followup.sh now` from the head of r4_filesource.sh so the
# short xplane legs (VERDICT rank 2) run BEFORE the multi-hour file-source/
# quality legs; standalone invocation waits for the r5 watcher queue (one
# TPU process at a time, rule 2).
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5_followup}
mkdir -p "$LOG"

if [ "${1:-}" != "now" ] && [ -f /tmp/r5_watch.pid ]; then
  wp=$(cat /tmp/r5_watch.pid)
  while kill -0 "$wp" 2>/dev/null; do
    echo "waiting for r5 watcher (pid $wp) $(date -u +%H:%M:%S)"
    sleep 120
  done
fi

run() { # run <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  wait_up 7200 || { echo "SKIP $name (tunnel out)"; return 1; }
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$? -> $LOG/$name.log"; tail -2 "$LOG/$name.log"
}

for c in c3:config3 c4:config4; do
  name=${c%%:*}; preset=${c##*:}
  rm -rf "/tmp/r5_prof_$name"
  run "prof_$name" 1200 python -m action_conditioned_gans_tpu train \
    --preset "$preset" --workdir "/tmp/r5_prof_$name" --steps 48 \
    --profile-steps 8 --set train.steps_per_call=8 \
    --set train.sample_every=0 --set train.checkpoint_every=0
  run "prof_${name}_report" 300 python -m action_conditioned_gans_tpu \
    profile-report --workdir "/tmp/r5_prof_$name" --json "$LOG/prof_$name.json"
done

rm -rf /tmp/r5_cc
run cache_cold 600 env ACGAN_BENCH_DEADLINE=540 ACGAN_BENCH_STEPS=8 \
  ACGAN_COMPILE_CACHE_DIR=/tmp/r5_cc python bench.py
run cache_warm 600 env ACGAN_BENCH_DEADLINE=540 ACGAN_BENCH_STEPS=8 \
  ACGAN_COMPILE_CACHE_DIR=/tmp/r5_cc python bench.py

echo "=== r5 follow-up done $(date -u +%H:%M:%S) ==="
