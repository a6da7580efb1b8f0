#!/bin/bash
# Round-5 session-2 on-chip queue, fired on tunnel recovery:
#   1. bench cold  — populates the now-default .compile_cache at HEAD so the
#      driver's end-of-round BENCH_r05 capture spends ~2 s compiling, not ~20.
#   2. bench warm  — confirms the warm compile_s on the exact driver command.
#   3. kill/resume — STEPS=16384 (the 65,536-step leg could not finish inside
#      its timeout in the 2026-08-19 degraded-tunnel window; the kill still
#      provably lands mid-run at step 2048).
#   4. serve A/B   — prep + live + aot legs with the new ?encoding=uint8
#      request timings next to float32 (prices the transport share).
# Stop cleanly with: PIDFILE=/tmp/r5b_onchip.pid bash scripts/r4_stop.sh
# (MUST happen before the driver's end-of-round bench.py — rule 2.)
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5b_onchip}
mkdir -p "$LOG"
echo $$ >/tmp/r5b_onchip.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
note "r5b_onchip watcher start"

wait_up 86400 || { note "gave up after 24h"; exit 3; }
note "TUNNEL UP; settling 30s"; sleep 30

note "=== bench cold (populates .compile_cache) ==="
timeout 700 python bench.py >"$LOG/bench_cold.log" 2>&1
note "rc=$? $(tail -1 "$LOG/bench_cold.log")"

wait_up 14400 || exit 3
note "=== bench warm ==="
timeout 700 python bench.py >"$LOG/bench_warm.log" 2>&1
note "rc=$? $(tail -1 "$LOG/bench_warm.log")"

wait_up 14400 || exit 3
note "=== kill/resume STEPS=16384 ==="
STEPS=16384 bash scripts/r5_kill_resume.sh >"$LOG/kill_resume.log" 2>&1
note "rc=$? $(tail -2 "$LOG/kill_resume.log")"

wait_up 14400 || exit 3
note "=== serve prep ==="
timeout 900 bash scripts/r5_serve_leg.sh prep >"$LOG/serve_prep.log" 2>&1
note "rc=$?"
wait_up 14400 || exit 3
note "=== serve live (incl. uint8 A/B) ==="
timeout 1800 bash scripts/r5_serve_leg.sh live >"$LOG/serve_live.log" 2>&1
note "rc=$? $(tail -1 "$LOG/serve_live.log")"
wait_up 14400 || exit 3
note "=== serve aot (incl. uint8 A/B) ==="
timeout 1800 bash scripts/r5_serve_leg.sh aot >"$LOG/serve_aot.log" 2>&1
note "rc=$? $(tail -1 "$LOG/serve_aot.log")"

note "R5B ONCHIP COMPLETE"
rm -f /tmp/r5b_onchip.pid
