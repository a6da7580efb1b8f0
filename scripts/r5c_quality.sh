#!/bin/bash
# Round-5 session-2 extended config5 quality leg: the r5 stability run was
# 400 steps (BASELINE.md "config5 256² stability"); this resumes nothing and
# trains 1,600 fresh steps at the same flagship geometry (256², T=30,
# batch 32, disc_microbatch=120, k=2) with EMA + periodic in-training eval,
# then samples strips and runs a held-out eval — upgrading "trains stably
# for 400 steps" to a 4x longer run with an eval trajectory.
#
# Queued BEHIND scripts/r5d_deconv_ab.sh (which itself queues behind
# r5b_onchip.sh): waits for its pidfile to vanish (one TPU process at a
# time, CLAUDE.md rule 2), then wait_up-gates. The short measured legs go
# first so a flapping tunnel cannot starve them behind this multi-hour run.
# Stop cleanly with: PIDFILE=/tmp/r5c_quality.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5c_quality}
mkdir -p "$LOG"
echo $$ >/tmp/r5c_quality.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
note "r5c_quality start; waiting for the r5b and r5d queues to drain"

for gate in /tmp/r5b_onchip.pid /tmp/r5d_deconv.pid /tmp/r5e_kill.pid; do
  while [ -f "$gate" ] && kill -0 "$(cat "$gate")" 2>/dev/null; do
    sleep 60
  done
done
note "r5b+r5d+r5e drained"
wait_up 86400 || { note "tunnel out 24h; giving up"; exit 3; }
note "TUNNEL UP; settling 30s"; sleep 30

note "=== bench warm (driver-path confirmation; cold run populated .compile_cache) ==="
timeout 700 python bench.py >"$LOG/bench_warm.log" 2>&1
note "rc=$? $(tail -1 "$LOG/bench_warm.log")"

wait_up 14400 || exit 3
note "=== config5 1600-step quality run ==="
rm -rf /tmp/r5_q_c5
timeout 14000 python -m action_conditioned_gans_tpu train --preset config5 \
  --workdir /tmp/r5_q_c5 --steps 1600 \
  --set train.disc_microbatch=120 --set train.steps_per_call=2 \
  --set train.ema_decay=0.999 \
  --set train.log_every=100 --set train.sample_every=400 \
  --set train.checkpoint_every=400 \
  >"$LOG/c5_train.log" 2>&1
note "train rc=$? $(grep -E '\"step\"' "$LOG/c5_train.log" | tail -1)"

wait_up 14400 || exit 3
note "=== sample (EMA) ==="
timeout 3600 python -m action_conditioned_gans_tpu sample --preset config5 \
  --workdir /tmp/r5_q_c5 --ema --num-clips 4 --out "$LOG/c5_samples" \
  --set train.disc_microbatch=120 --set train.steps_per_call=2 \
  --set train.ema_decay=0.999 >"$LOG/c5_sample.log" 2>&1
note "sample rc=$? $(tail -1 "$LOG/c5_sample.log")"

wait_up 14400 || exit 3
note "=== held-out eval (EMA) ==="
timeout 3600 python -m action_conditioned_gans_tpu eval --preset config5 \
  --workdir /tmp/r5_q_c5 --ema --set train.disc_microbatch=120 \
  --set train.steps_per_call=2 --set train.ema_decay=0.999 \
  >"$LOG/c5_eval.log" 2>&1
note "eval rc=$? $(tail -1 "$LOG/c5_eval.log")"

note "R5C QUALITY COMPLETE"
rm -f /tmp/r5c_quality.pid
