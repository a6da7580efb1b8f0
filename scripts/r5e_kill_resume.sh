#!/bin/bash
# Round-5 session-3 make-up leg: the r5b kill/resume leg (STEPS=16384)
# skipped with rc=2 because the container wipe deleted the
# /tmp/r4_bair_fixture make-data fixture; the fixture has been regenerated
# host-side. Runs the corrected mid-run SIGKILL + resume-to-completion
# PASS (BASELINE.md r5 session-2: every resilience mechanism fired on
# hardware; the scripted run-to-completion PASS is the one missing piece).
#
# Queued BEHIND scripts/r5d_deconv_ab.sh, AHEAD of r5c_quality.sh.
# Stop cleanly with: PIDFILE=/tmp/r5e_kill.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5e_kill}
mkdir -p "$LOG"
echo $$ >/tmp/r5e_kill.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
note "r5e_kill start; waiting for the r5b and r5d queues to drain"

for gate in /tmp/r5b_onchip.pid /tmp/r5d_deconv.pid; do
  while [ -f "$gate" ] && kill -0 "$(cat "$gate")" 2>/dev/null; do
    sleep 60
  done
done
note "r5b+r5d drained"
wait_up 86400 || { note "tunnel out 24h; giving up"; exit 3; }
note "TUNNEL UP; settling 30s"; sleep 30

[ -f /tmp/r4_bair_fixture/data/clips.tfrecord ] || {
  note "fixture still missing"; rm -f /tmp/r5e_kill.pid; exit 2; }
note "=== kill/resume STEPS=16384 ==="
STEPS=16384 bash scripts/r5_kill_resume.sh >"$LOG/kill_resume.log" 2>&1
note "rc=$? $(tail -2 "$LOG/kill_resume.log" | tr '\n' ' ')"

note "R5E KILL/RESUME COMPLETE"
rm -f /tmp/r5e_kill.pid
