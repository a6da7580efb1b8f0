#!/bin/bash
# Round-5 final on-chip legs, fired on tunnel recovery (the tunnel dropped
# again at ~15:45 UTC right after the main queue drained):
#   1. bench.py with the NEW default-on compile cache — the first run
#      populates <repo>/.compile_cache, the second confirms the warm-path
#      compile_s on the exact command the driver runs, so the end-of-round
#      BENCH_r05 capture spends ~2 s compiling instead of ~20 s.
#   2. scripts/r5_kill_resume.sh — the corrected mid-run SIGKILL + resume
#      (the r4 leg's kill landed post-completion; BASELINE.md r5).
# Stop cleanly with: PIDFILE=/tmp/r5_final.pid bash scripts/r4_stop.sh
# (MUST happen before the driver's end-of-round bench.py — rule 2.)
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5_final}
mkdir -p "$LOG"
echo $$ >/tmp/r5_final.pid
echo "r5_final watcher start $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"

wait_up 86400 || { echo "gave up after 24h" | tee -a "$LOG/watch.log"; exit 3; }
echo "TUNNEL UP $(date -u +%F' '%T); settling 30s" | tee -a "$LOG/watch.log"
sleep 30

echo "=== bench cold (populates .compile_cache) $(date -u +%T) ===" | tee -a "$LOG/watch.log"
timeout 700 python bench.py >"$LOG/bench_cold.log" 2>&1
echo "rc=$? $(tail -1 "$LOG/bench_cold.log")" | tee -a "$LOG/watch.log"

wait_up 7200 || exit 3
echo "=== bench warm (driver-path confirmation) $(date -u +%T) ===" | tee -a "$LOG/watch.log"
timeout 700 python bench.py >"$LOG/bench_warm.log" 2>&1
echo "rc=$? $(tail -1 "$LOG/bench_warm.log")" | tee -a "$LOG/watch.log"

wait_up 7200 || exit 3
echo "=== kill/resume $(date -u +%T) ===" | tee -a "$LOG/watch.log"
bash scripts/r5_kill_resume.sh >"$LOG/kill_resume.log" 2>&1
echo "rc=$? $(tail -2 "$LOG/kill_resume.log")" | tee -a "$LOG/watch.log"

echo "R5 FINAL COMPLETE $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"
rm -f /tmp/r5_final.pid
