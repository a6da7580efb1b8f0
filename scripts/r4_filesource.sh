#!/bin/bash
# Round-4 on-chip END-TO-END file-source training (VERDICT r3 next-step 4 /
# missing 3): prove the host pipeline (decode -> crop -> normalize ->
# place_batch under the Prefetcher double-buffer) feeds a real chip, and
# that resume's data-stream fast-forward holds under real dispatch.
#
# Protocol: same geometry (config1 preset: batch 8, k=64), three sources —
# synthetic (device-resident, the ceiling), tfrecord_native, tfrecord
# (tf.data) — each ~2k steps; the steady-state dispatch cadence printed by
# the loop is the comparator (labeled cadence, not true-barrier; the
# BASELINE.md write-up must keep that caveat). Then a SIGKILL mid-run and a
# resume on the native source, checking the stream fast-forward.
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh

# r5: run the short follow-up legs (xplane retries + compile-cache probe,
# VERDICT rank 2) ahead of these multi-hour legs — this script is the
# watcher's next slot after r5_onchip.sh, so this is the earliest
# single-tenant window for them.
bash scripts/r5_followup.sh now || true

LOG=${LOG:-/tmp/r4_filesource}
DATA=${DATA:-/tmp/r4_bair_fixture}
mkdir -p "$LOG"

if [ ! -f "$DATA/data/clips.tfrecord" ]; then
  echo "=== make-data (CPU platform; keeps the TPU single-tenant) ==="
  python - <<EOF
import sys
sys.argv = ["acgan", "make-data", "--preset", "config1",
            "--workdir", "$DATA", "--num-clips", "512"]
import jax; jax.config.update("jax_platforms", "cpu")
from action_conditioned_gans_tpu.cli import main
sys.exit(main(sys.argv[1:]))
EOF
fi
ls -la "$DATA/data/"

run_train() { # run_train <name> <workdir> <steps> <extra --set ...>
  local name=$1 wd=$2 steps=$3; shift 3
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  wait_up 3600 || { echo "SKIP $name (tunnel out)"; return 1; }
  rm -rf "$wd"
  timeout 1500 python -m action_conditioned_gans_tpu train --preset config1 \
    --workdir "$wd" --steps "$steps" --set train.log_every=256 \
    --set train.sample_every=0 --set train.checkpoint_every=1024 "$@" \
    >"$LOG/$name.log" 2>&1
  echo "rc=$?"; grep -E "cadence|resumed" "$LOG/$name.log" | tail -3
}

SRC_NATIVE=(--set data.source=tfrecord_native --set "data.data_dir=$DATA/data" --set data.clip_len=30)
SRC_TFDATA=(--set data.source=tfrecord --set "data.data_dir=$DATA/data" --set data.clip_len=30)

run_train synthetic /tmp/r4_fs_syn 2048
run_train native   /tmp/r4_fs_nat 2048 "${SRC_NATIVE[@]}"
run_train tfdata   /tmp/r4_fs_tfd 2048 "${SRC_TFDATA[@]}"

echo "=== SIGKILL + resume on the native source ==="
rm -rf /tmp/r4_fs_kill
timeout 1500 python -m action_conditioned_gans_tpu train --preset config1 \
  --workdir /tmp/r4_fs_kill --steps 4096 --set train.log_every=256 \
  --set train.sample_every=0 --set train.checkpoint_every=512 \
  "${SRC_NATIVE[@]}" >"$LOG/kill_phase1.log" 2>&1 &
PID=$!
sleep 300   # let it compile (~1-4 min) and pass a checkpoint boundary
kill -9 $PID 2>/dev/null; wait $PID 2>/dev/null
echo "killed at $(date -u +%H:%M:%S); checkpoints:"; ls /tmp/r4_fs_kill/checkpoints 2>/dev/null
# NOTE: SIGKILL on a TPU-holding process wedges the lease ~10-15 min
# (CLAUDE.md rule 3) — that wedging is part of what this test must survive.
# Poll the subprocess canary OUT of the wedge window rather than sleeping a
# fixed time inside it (r4 review: a fixed 660 s lands mid-window and the
# resume leg then reads as a resume failure for platform reasons).
sleep 300
for i in $(seq 1 12); do
  if timeout 150 python - <<'EOF' >/dev/null 2>&1
from action_conditioned_gans_tpu.utils.doctor import device_probe
r = device_probe(120)
assert r.get("ok") and r.get("platform") != "cpu", r
EOF
  then echo "lease released after probe $i ($(date -u +%H:%M:%S))"; break; fi
  echo "lease still wedged (probe $i, $(date -u +%H:%M:%S))"; sleep 60
done
timeout 1500 python -m action_conditioned_gans_tpu train --preset config1 \
  --workdir /tmp/r4_fs_kill --steps 4096 --set train.log_every=256 \
  --set train.sample_every=0 --set train.checkpoint_every=512 \
  "${SRC_NATIVE[@]}" >"$LOG/kill_phase2.log" 2>&1
echo "rc=$?"; grep -E "resumed|cadence" "$LOG/kill_phase2.log" | tail -3
