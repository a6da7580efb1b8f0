#!/bin/bash
# Round-5 session-4: replacement for scripts/r5c_quality.sh. Order:
#   1. head_subpixel retry — the r5d run of it was eaten by a tunnel flap
#      (watchdog rc=3 at 22:30, /tmp/r5d_deconv/head_subpixel.log) and r5d
#      does not retry legs.
#   2. conv0=s2d A/B — the NEW input-side engine (commit c6840de): headline
#      geometry alone and combined with deconv=subpixel, plus 24-step
#      probes at config3 (where the edge class is 36% of op-sum) and the
#      combined engines at config5. Win-or-lose into BASELINE.md.
#   3. bench warm (driver-path confirmation of the final headline).
#   4. The extended config5 1600-step quality leg (from r5c, unchanged).
# Short measured legs go first so a flapping tunnel cannot starve them
# behind the multi-hour quality run.
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

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  wait_up 14400 || { note "$name SKIPPED (tunnel)"; return 1; }
  note "=== $name ==="
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  note "$name rc=$? $(tail -1 "$LOG/$name.log")"
}

# 1. head_subpixel retry (r5d leg lost to the 22:30 flap).
run head_subpixel 700 env \
  ACGAN_BENCH_OVERRIDES="train.adam_moment_dtype=bfloat16 model.deconv=subpixel" \
  python bench.py

# 2. conv0=s2d A/B at the headline geometry: alone, then both engines.
run head_s2d 700 env \
  ACGAN_BENCH_OVERRIDES="train.adam_moment_dtype=bfloat16 model.conv0=s2d" \
  python bench.py
run head_both 700 env \
  ACGAN_BENCH_OVERRIDES="train.adam_moment_dtype=bfloat16 model.conv0=s2d model.deconv=subpixel" \
  python bench.py

# 2b. Preset-geometry probes (r5d measures the xla/subpixel legs).
for spec in "config3 s2d xla" "config3 s2d subpixel" "config5 s2d subpixel"; do
  set -- $spec
  preset=$1 c0=$2 dec=$3
  run "${preset}_c0${c0}_dec${dec}" 1500 python - <<EOF
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("$preset")
cfg = dataclasses.replace(
    cfg, model=dataclasses.replace(cfg.model, conv0="$c0", deconv="$dec"))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF
done

# 3. bench warm (driver-path confirmation).
run bench_warm 700 python bench.py

# 4. config5 1600-step quality run (unchanged from r5c).
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
