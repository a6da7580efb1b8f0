#!/bin/bash
# Round-5 stability-knob quality A/B (VERDICT r4 next-step 5 / weak 6): the
# r4 knobs (hinge, spectral norm, R1, augment) are math-pinned but value-
# unproven. One controlled A/B at config3 geometry (128², deepest D — the
# knobs all act on D): default CE loss vs hinge+SN, same seed, same steps,
# eval PSNR/SSIM + strips. Win or lose, the result goes in BASELINE.md like
# wgrad=patches did.
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5_quality_ab}
mkdir -p "$LOG"
STEPS=${STEPS:-3000}

run_arm() { # run_arm <name> <extra --set ...>
  local name=$1; shift
  echo "=== arm $name ($(date -u +%H:%M:%S)) ==="
  wait_up 3600 || { echo "SKIP $name (tunnel out)"; return 1; }
  rm -rf "/tmp/r5_ab_$name"
  timeout 3600 python -m action_conditioned_gans_tpu train --preset config3 \
    --workdir "/tmp/r5_ab_$name" --steps "$STEPS" \
    --set train.log_every=256 --set train.sample_every=0 \
    --set train.checkpoint_every="$STEPS" "$@" \
    >"$LOG/${name}_train.log" 2>&1
  echo "train rc=$?"; grep -E "cadence" "$LOG/${name}_train.log" | tail -1
  wait_up 1800 || return 1
  timeout 900 python -m action_conditioned_gans_tpu eval --preset config3 \
    --workdir "/tmp/r5_ab_$name" "$@" >"$LOG/${name}_eval.log" 2>&1
  echo "eval rc=$?"; tail -2 "$LOG/${name}_eval.log"
  timeout 900 python -m action_conditioned_gans_tpu sample --preset config3 \
    --workdir "/tmp/r5_ab_$name" --num-clips 4 --out "$LOG/${name}_samples" \
    "$@" >"$LOG/${name}_sample.log" 2>&1
  echo "sample rc=$?"
}

run_arm base
run_arm hinge_sn --set train.gan_loss=hinge --set model.d_spectral_norm=true
echo "=== A/B done $(date -u +%H:%M:%S) ==="
