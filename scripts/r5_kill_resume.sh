#!/bin/bash
# r5: CORRECTED mid-run SIGKILL + resume on hardware (VERDICT r4
# next-step 3's last open sub-item). The r4_filesource.sh kill leg's fixed
# 300 s timer fired AFTER its 4,096-step run had already completed (config1
# steps are ~0.6 ms — the run is compile-dominated), so phase 2 only proved
# checkpoint restore + no-op resume (BASELINE.md r5 file-source section).
#
# Fix: event-driven kill — poll the workdir until the FIRST completed orbax
# checkpoint appears (a bare-integer step dir; orbax writes tmp-suffixed
# dirs until commit), then SIGKILL while tens of thousands of steps remain.
# STEPS (default 65536; overridable — a degraded-tunnel window may need a
# smaller run that still kills mid-stream) with checkpoint_every=2048 puts
# the first checkpoint a few % into the run; the kill then provably lands
# mid-run, and phase 2 must restore
# params + both opt states + EMA + the native reader's stream position and
# train on to completion. Phase 2's log must show "resumed from checkpoint
# at step N" with 0 < N < $STEPS for the leg to PASS (asserted below).
#
# Platform rules honored: SIGKILL on the TPU holder wedges the lease
# ~10-15 min (CLAUDE.md rule 3) — that wedging is part of what resume must
# survive; we poll OUT of it with the subprocess canary (rule 5b). One TPU
# process at a time (rule 2): run only after the main queue drains.
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5_kill}
STEPS=${STEPS:-65536}
DATA=${DATA:-/tmp/r4_bair_fixture}
WD=/tmp/r5_kill_wd
CACHE=${ACGAN_COMPILE_CACHE_DIR:-/tmp/r5_cc_cli}
mkdir -p "$LOG"

if [ ! -f "$DATA/data/clips.tfrecord" ]; then
  echo "fixture missing — run r4_filesource.sh first" >&2; exit 2
fi

SRC_NATIVE=(--set data.source=tfrecord_native --set "data.data_dir=$DATA/data" --set data.clip_len=30)
TRAIN=(python -m action_conditioned_gans_tpu train --preset config1
  --workdir "$WD" --steps "$STEPS" --set train.log_every=4096
  --set train.sample_every=0 --set train.checkpoint_every=2048
  "${SRC_NATIVE[@]}")

wait_up 7200 || { echo "tunnel out; aborting"; exit 3; }
rm -rf "$WD"
echo "=== phase 1 ($(date -u +%H:%M:%S)): train until first checkpoint, then SIGKILL ==="
ACGAN_COMPILE_CACHE_DIR="$CACHE" "${TRAIN[@]}" >"$LOG/phase1.log" 2>&1 &
PID=$!
# Poll for the first COMMITTED checkpoint (bare-integer dir name). Bound the
# wait: compile is ~1-4 min cold; give up at 15 min (phase1 died -> fail).
KILLED=0
for i in $(seq 1 900); do
  kill -0 $PID 2>/dev/null || break
  if ls "$WD/checkpoints" 2>/dev/null | grep -qE '^[0-9]+$'; then
    sleep 3   # let the commit rename fully settle
    kill -9 $PID 2>/dev/null && KILLED=1
    break
  fi
  sleep 1
done
wait $PID 2>/dev/null
if [ "$KILLED" != 1 ]; then
  echo "FAIL: phase 1 exited before any checkpoint committed (rc above)"
  tail -5 "$LOG/phase1.log"; exit 1
fi
echo "SIGKILLed mid-run at $(date -u +%H:%M:%S); committed checkpoints:"
ls "$WD/checkpoints" | grep -E '^[0-9]+$'

# Wait out the lease wedge with the subprocess canary (not a fixed sleep).
sleep 240
for i in $(seq 1 15); do
  if timeout 150 python - <<'EOF' >/dev/null 2>&1
from action_conditioned_gans_tpu.utils.doctor import device_probe
r = device_probe(120)
assert r.get("ok") and r.get("platform") != "cpu", r
EOF
  then echo "lease released after probe $i ($(date -u +%H:%M:%S))"; break; fi
  echo "lease still wedged (probe $i, $(date -u +%H:%M:%S))"; sleep 60
done

echo "=== phase 2 ($(date -u +%H:%M:%S)): resume to completion ==="
ACGAN_COMPILE_CACHE_DIR="$CACHE" timeout 1500 "${TRAIN[@]}" >"$LOG/phase2.log" 2>&1
rc=$?
grep -E "resumed|cadence" "$LOG/phase2.log" | tail -3
STEP=$(grep -oE "resumed from checkpoint at step [0-9]+" "$LOG/phase2.log" | grep -oE "[0-9]+$" || echo "")
if [ "$rc" = 0 ] && [ -n "$STEP" ] && [ "$STEP" -gt 0 ] && [ "$STEP" -lt "$STEPS" ]; then
  echo "PASS: mid-run SIGKILL at step $STEP survived; resumed and ran to $STEPS"
else
  echo "FAIL: rc=$rc resumed_step='${STEP:-none}'"; exit 1
fi
