#!/bin/bash
# Round-5 session-4: RETRYING work-queue runner, replacing the fire-once
# r5f script. Motivation: the tunnel is flapping in short live windows
# (r5d lost head_subpixel at 22:30 and config3_xla at 23:08 to mid-leg
# flaps, and fire-once scripts never retry a lost leg). This runner makes
# multiple passes over the measurement list; a leg is skipped once ANY
# prior log (its own, or the r5d queue's for the legs r5d owns) ends in a
# parseable success JSON, so a flap costs one pass, not the measurement.
#
# Work list (short measured legs first, multi-hour quality last):
#   1. headline A/Bs: deconv=subpixel, conv0=s2d, both (driver bench.py).
#   2. preset probes: config3/config5 x {xla, subpixel, s2d, both}
#      (24-step run_bench; r5d's successes are honored, its losses redone).
#   3. bench_warm — driver-path confirmation at HEAD.
#   4. config5 1600-step quality run + sample + eval; retries RESUME from
#      the every-400-step checkpoints instead of restarting (train --steps
#      is a total-step target and resume is the CLI default).
#
# Queue position: BEHIND r5d and r5e (one TPU process at a time, rule 2).
# Stop cleanly with: PIDFILE=/tmp/r5g_runner.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5g}
mkdir -p "$LOG"
echo $$ >/tmp/r5g_runner.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
note "r5g_runner start; waiting for the r5d/r5e queues to drain"

for gate in /tmp/r5b_onchip.pid /tmp/r5d_deconv.pid /tmp/r5e_kill.pid; do
  while [ -f "$gate" ] && kill -0 "$(cat "$gate")" 2>/dev/null; do
    sleep 60
  done
done
note "queues drained"

ok() { # ok LOGFILE -> 0 iff its last line is a success JSON
  python - "$1" <<'EOF'
import json, os, sys
p = sys.argv[1]
if not os.path.exists(p):
    sys.exit(1)
lines = [l.strip() for l in open(p, errors="replace") if l.strip()]
if not lines:
    sys.exit(1)
try:
    d = json.loads(lines[-1])
except Exception:
    sys.exit(1)
if not isinstance(d, dict) or d.get("error"):
    sys.exit(1)
sys.exit(0 if (d.get("value", 0) or 0) > 0 or "frames_per_sec_per_chip" in d else 1)
EOF
}

leg_done() { # leg_done NAME — also honor the r5d queue's same-named logs
  ok "$LOG/$1.log" && return 0
  ok "/tmp/r5d_deconv/$1.log" && return 0
  return 1
}

head_leg() { # head_leg NAME OVERRIDES
  leg_done "$1" && return 0
  wait_up 14400 || return 1
  note "=== $1 ==="
  timeout 700 env ACGAN_BENCH_OVERRIDES="$2" python bench.py \
    >"$LOG/$1.log" 2>&1
  note "$1 rc=$? $(tail -1 "$LOG/$1.log")"
  leg_done "$1"
}

probe_leg() { # probe_leg NAME PRESET CONV0 DECONV
  leg_done "$1" && return 0
  wait_up 14400 || return 1
  note "=== $1 ==="
  timeout 1500 python - "$2" "$3" "$4" >"$LOG/$1.log" 2>&1 <<'EOF'
import dataclasses, json, sys
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
preset, c0, dec = sys.argv[1:4]
cfg = get_preset(preset)
cfg = dataclasses.replace(
    cfg, model=dataclasses.replace(cfg.model, conv0=c0, deconv=dec))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF
  note "$1 rc=$? $(tail -1 "$LOG/$1.log")"
  leg_done "$1"
}

measured_pass() { # one pass over every short measured leg; returns 0 if ALL done
  local all=0
  head_leg head_subpixel "train.adam_moment_dtype=bfloat16 model.deconv=subpixel" || all=1
  head_leg head_s2d "train.adam_moment_dtype=bfloat16 model.conv0=s2d" || all=1
  head_leg head_both "train.adam_moment_dtype=bfloat16 model.conv0=s2d model.deconv=subpixel" || all=1
  probe_leg config3_xla config3 xla xla || all=1
  probe_leg config3_subpixel config3 xla subpixel || all=1
  probe_leg config3_c0s2d_decxla config3 s2d xla || all=1
  probe_leg config3_c0s2d_decsubpixel config3 s2d subpixel || all=1
  probe_leg config5_xla config5 xla xla || all=1
  probe_leg config5_subpixel config5 xla subpixel || all=1
  probe_leg config5_c0s2d_decsubpixel config5 s2d subpixel || all=1
  return $all
}

for pass in 1 2 3 4 5 6 7 8; do
  note "--- measured pass $pass ---"
  if measured_pass; then note "all measured legs done"; break; fi
done

# bench_warm: the exact driver command, retried like a leg.
for pass in 1 2 3; do
  leg_done bench_warm && break
  wait_up 14400 || continue
  note "=== bench_warm ==="
  timeout 700 python bench.py >"$LOG/bench_warm.log" 2>&1
  note "bench_warm rc=$? $(tail -1 "$LOG/bench_warm.log")"
done

# config5 1600-step quality run: retries RESUME from the last checkpoint.
for attempt in 1 2 3 4 5 6; do
  [ -f "$LOG/c5_train.done" ] && break
  wait_up 14400 || continue
  note "=== config5 quality train attempt $attempt ==="
  timeout 14000 python -m action_conditioned_gans_tpu train --preset config5 \
    --workdir /tmp/r5_q_c5 --steps 1600 \
    --set train.disc_microbatch=120 --set train.steps_per_call=2 \
    --set train.ema_decay=0.999 \
    --set train.log_every=100 --set train.sample_every=400 \
    --set train.checkpoint_every=400 \
    >>"$LOG/c5_train.log" 2>&1
  rc=$?
  note "train rc=$rc $(grep -E '\"step\"' "$LOG/c5_train.log" | tail -1)"
  [ $rc -eq 0 ] && touch "$LOG/c5_train.done"
done

if [ -f "$LOG/c5_train.done" ]; then
  for attempt in 1 2 3; do
    [ -f "$LOG/c5_sample.done" ] && break
    wait_up 14400 || continue
    note "=== sample (EMA) attempt $attempt ==="
    timeout 3600 python -m action_conditioned_gans_tpu sample --preset config5 \
      --workdir /tmp/r5_q_c5 --ema --num-clips 4 --out "$LOG/c5_samples" \
      --set train.disc_microbatch=120 --set train.steps_per_call=2 \
      --set train.ema_decay=0.999 >"$LOG/c5_sample.log" 2>&1
    rc=$?
    note "sample rc=$rc $(tail -1 "$LOG/c5_sample.log")"
    [ $rc -eq 0 ] && touch "$LOG/c5_sample.done"
  done
  for attempt in 1 2 3; do
    [ -f "$LOG/c5_eval.done" ] && break
    wait_up 14400 || continue
    note "=== held-out eval (EMA) attempt $attempt ==="
    timeout 3600 python -m action_conditioned_gans_tpu eval --preset config5 \
      --workdir /tmp/r5_q_c5 --ema --set train.disc_microbatch=120 \
      --set train.steps_per_call=2 --set train.ema_decay=0.999 \
      >"$LOG/c5_eval.log" 2>&1
    rc=$?
    note "eval rc=$rc $(tail -1 "$LOG/c5_eval.log")"
    [ $rc -eq 0 ] && touch "$LOG/c5_eval.done"
  done
fi

note "R5G RUNNER COMPLETE"
rm -f /tmp/r5g_runner.pid
