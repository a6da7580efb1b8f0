#!/bin/bash
# Round-4 training-quality evidence for configs 2 and 5 (VERDICT r3 weak 5 /
# next-step 6): a config2 run (64², T=10, EMA) to eval-PSNR plateau, and a
# config5-geometry run (256², T=30, single-chip disc_microbatch=120, a few
# hundred steps) proving stable losses and visually sane strips at 256².
# Strips/metrics land in $LOG; curate into docs/assets + README by hand.
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r4_quality}
mkdir -p "$LOG"

wait_up 3600 || { echo "ABORT quality runs (tunnel out)"; exit 9; }
echo "=== config2 to PSNR plateau ($(date -u +%H:%M:%S)) ==="
rm -rf /tmp/r4_q_c2
timeout 5400 python -m action_conditioned_gans_tpu train --preset config2 \
  --workdir /tmp/r4_q_c2 --steps 12000 \
  --set train.ema_decay=0.999 --set train.log_every=512 \
  --set train.sample_every=1024 --set train.checkpoint_every=4096 \
  >"$LOG/c2_train.log" 2>&1
echo "rc=$?"; grep -E "cadence" "$LOG/c2_train.log" | tail -1
grep -o '"eval_psnr[^,]*' "$LOG/c2_train.log" | tail -5 || true
timeout 900 python -m action_conditioned_gans_tpu sample --preset config2 \
  --workdir /tmp/r4_q_c2 --ema --num-clips 8 --out "$LOG/c2_samples" \
  --set train.ema_decay=0.999 >"$LOG/c2_sample.log" 2>&1
echo "sample rc=$?"; tail -1 "$LOG/c2_sample.log"
timeout 900 python -m action_conditioned_gans_tpu eval --preset config2 \
  --workdir /tmp/r4_q_c2 --ema --set train.ema_decay=0.999 \
  >"$LOG/c2_eval.log" 2>&1
echo "eval rc=$?"; tail -1 "$LOG/c2_eval.log"

wait_up 3600 || { echo "ABORT config5 run (tunnel out)"; exit 9; }
echo "=== config5 geometry, stability run ($(date -u +%H:%M:%S)) ==="
rm -rf /tmp/r4_q_c5
timeout 5400 python -m action_conditioned_gans_tpu train --preset config5 \
  --workdir /tmp/r4_q_c5 --steps 400 \
  --set train.disc_microbatch=120 --set train.steps_per_call=2 \
  --set train.log_every=20 --set train.sample_every=200 \
  --set train.checkpoint_every=200 \
  >"$LOG/c5_train.log" 2>&1
echo "rc=$?"; grep -E '"step"' "$LOG/c5_train.log" | tail -3
timeout 1800 python -m action_conditioned_gans_tpu sample --preset config5 \
  --workdir /tmp/r4_q_c5 --num-clips 4 --out "$LOG/c5_samples" \
  --set train.disc_microbatch=120 --set train.steps_per_call=2 \
  >"$LOG/c5_sample.log" 2>&1
echo "sample rc=$?"; tail -1 "$LOG/c5_sample.log"
