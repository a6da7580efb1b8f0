#!/bin/bash
# Round-5 session-4: replacement for scripts/r5c_quality.sh (stopped while
# still gate-waiting) that FIRST retries the head_subpixel A/B leg — the
# r5d run of it was eaten by a tunnel flap (watchdog rc=3 at 22:30, log
# /tmp/r5d_deconv/head_subpixel.log) and r5d does not retry legs — then
# runs the extended config5 quality leg unchanged.
#
# Queue position: BEHIND r5b (done), r5d and r5e — waits on their pidfiles
# (one TPU process at a time, CLAUDE.md rule 2).
# Stop cleanly with: PIDFILE=/tmp/r5f_quality.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5f_quality}
mkdir -p "$LOG"
echo $$ >/tmp/r5f_quality.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
note "r5f_quality start; waiting for the r5b/r5d/r5e queues to drain"

for gate in /tmp/r5b_onchip.pid /tmp/r5d_deconv.pid /tmp/r5e_kill.pid; do
  while [ -f "$gate" ] && kill -0 "$(cat "$gate")" 2>/dev/null; do
    sleep 60
  done
done
note "r5b+r5d+r5e drained"
wait_up 86400 || { note "tunnel out 24h; giving up"; exit 3; }
note "TUNNEL UP; settling 30s"; sleep 30

note "=== head_subpixel retry (r5d leg lost to the 22:30 flap) ==="
timeout 700 env \
  ACGAN_BENCH_OVERRIDES="train.adam_moment_dtype=bfloat16 model.deconv=subpixel" \
  python bench.py >"$LOG/head_subpixel.log" 2>&1
note "head_subpixel rc=$? $(tail -1 "$LOG/head_subpixel.log")"

wait_up 14400 || exit 3
note "=== bench warm (driver-path confirmation) ==="
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

note "R5F QUALITY COMPLETE"
rm -f /tmp/r5f_quality.pid
