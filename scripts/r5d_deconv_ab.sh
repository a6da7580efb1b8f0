#!/bin/bash
# Round-5 session-3: A/B the subpixel transposed-conv engine
# (ModelConfig.deconv="subpixel", ops/xla.py conv2d_transpose_subpixel) —
# the lever the r5 config3 xplane anatomy points at: the 3-channel-output
# deconvs (G dec_0 fwd + dgrad + wgrad) run at 2.4-44x their compute
# roofline with 125/128 MXU output lanes idle by construction; subpixel
# rewrites them exactly into a 2x2 conv to 4*cout channels + depth-to-space
# (BASELINE.md r5 "Per-op xplane anatomy: config3").
#
# Legs (default vs subpixel, same harness):
#   1. headline geometry (64^2 batch 128 k=128) via the driver bench.
#   2. config3 geometry (128^2, deep D — the edge class is 36% of op-sum).
#   3. config5 geometry (256^2 T=30 — biggest spatial, cheapest probe size).
# Win-or-lose into BASELINE.md either way (the wgrad=patches protocol).
#
# Queued BEHIND scripts/r5b_onchip.sh and AHEAD of the multi-hour
# r5c_quality.sh leg (one TPU process at a time, rule 2; short measured
# legs before long quality runs so a flapping tunnel can't starve them).
# Stop cleanly with: PIDFILE=/tmp/r5d_deconv.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5d_deconv}
mkdir -p "$LOG"
echo $$ >/tmp/r5d_deconv.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
note "r5d_deconv start; waiting for r5b queue to drain"

while [ -f /tmp/r5b_onchip.pid ] && kill -0 "$(cat /tmp/r5b_onchip.pid)" 2>/dev/null; do
  sleep 60
done
note "r5b drained"
wait_up 86400 || { note "tunnel out 24h; giving up"; exit 3; }
note "TUNNEL UP; settling 30s"; sleep 30

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  wait_up 14400 || { note "$name SKIPPED (tunnel)"; return 1; }
  note "=== $name ==="
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  note "$name rc=$? $(tail -1 "$LOG/$name.log")"
}

# 1. Headline geometry: driver bench, default vs subpixel.
run head_default 700 python bench.py
run head_subpixel 700 env \
  ACGAN_BENCH_OVERRIDES="train.adam_moment_dtype=bfloat16 model.deconv=subpixel" \
  python bench.py

# 2+3. Preset geometries via run_bench 24-step probes.
for preset in config3 config5; do
  for eng in xla subpixel; do
    run "${preset}_${eng}" 1500 python - <<EOF
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("$preset")
cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, deconv="$eng"))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF
  done
done

note "R5D DECONV A/B COMPLETE"
rm -f /tmp/r5d_deconv.pid
