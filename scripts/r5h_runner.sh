#!/bin/bash
# Round-5 session-5: consolidated RETRYING runner, replacing r5e_kill_resume
# (kill/resume make-up) + r5g_runner (engine A/Bs + quality). Two fixes over
# that pair:
#
#   1. ORDER. r5e ran the kill/resume leg FIRST, but that leg SIGKILLs the
#      TPU holder and then waits out the ~10-15 min lease wedge (rule 3) —
#      one whole live window spent on a redundant resilience PASS (every
#      mechanism already fired on hardware in session 2) while the engine
#      A/Bs starved. Here the short measured legs run first, kill/resume
#      after them, the multi-hour config5 quality leg last.
#   2. DEADLINE. The driver's end-of-round `python bench.py` must find the
#      TPU single-tenant (rule 2). Every leg is gated and bounded by a hard
#      wall-clock cutoff (DEADLINE_EPOCH, default now+5h15m); at the cutoff
#      the runner exits and frees the chip — r4_stop.sh remains the manual
#      override.
#
# Leg-completion is idempotent across queues: a leg is skipped once ANY
# prior log (its own, r5g's, or r5d's) ends in a parseable success JSON, so
# a tunnel flap costs one pass, not the measurement.
# Stop cleanly with: PIDFILE=/tmp/r5h_runner.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5h}
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 18900 ))}
mkdir -p "$LOG"
echo $$ >/tmp/r5h_runner.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/watch.log"; }
left() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
note "r5h_runner start; deadline $(date -u -d @"$DEADLINE_EPOCH" +%F' '%T) ($(left)s away)"

# Deadline-aware wait_up: never sleeps past the cutoff.
wait_up_dl() {
  local l; l=$(left)
  [ "$l" -le 180 ] && return 1
  wait_up $(( l - 120 ))
}

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

leg_done() { # honor this queue's, r5g's, and r5d's same-named logs
  ok "$LOG/$1.log" && return 0
  ok "/tmp/r5g/$1.log" && return 0
  ok "/tmp/r5d_deconv/$1.log" && return 0
  return 1
}

head_leg() { # head_leg NAME OVERRIDES
  leg_done "$1" && return 0
  [ "$(left)" -le 800 ] && return 1
  wait_up_dl || return 1
  note "=== $1 ==="
  timeout 700 env ACGAN_BENCH_OVERRIDES="$2" python bench.py \
    >"$LOG/$1.log" 2>&1
  note "$1 rc=$? $(tail -1 "$LOG/$1.log")"
  leg_done "$1"
}

probe_leg() { # probe_leg NAME PRESET CONV0 DECONV
  leg_done "$1" && return 0
  [ "$(left)" -le 1600 ] && return 1
  wait_up_dl || return 1
  note "=== $1 ==="
  timeout 1500 python - "$2" "$3" "$4" >"$LOG/$1.log" 2>&1 <<'EOF'
import dataclasses, json, sys
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
preset, c0, dec = sys.argv[1:4]
cfg = get_preset(preset)
cfg = dataclasses.replace(
    cfg, model=dataclasses.replace(cfg.model, conv0=c0, deconv=dec))
if preset == "config5":
    # Mirror run_presets()'s single-chip overrides: the pod-global batch 32
    # at 256^2 is an XLA OOM on one chip without D microbatching, and k=2
    # halves the 256^2 compile (bench.py:270). Keeps the A/B comparable to
    # the BENCH_PRESETS.json config5 row.
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, disc_microbatch=120, steps_per_call=2))
steps = 12 if preset == "config5" else 24
print(json.dumps(run_bench(cfg, steps=steps), default=str))
EOF
  note "$1 rc=$? $(tail -1 "$LOG/$1.log")"
  leg_done "$1"
}

measured_pass() { # one pass over every short measured leg; 0 iff ALL done
  local all=0
  head_leg head_subpixel "train.adam_moment_dtype=bfloat16 model.deconv=subpixel" || all=1
  head_leg head_s2d "train.adam_moment_dtype=bfloat16 model.conv0=s2d" || all=1
  head_leg head_both "train.adam_moment_dtype=bfloat16 model.conv0=s2d model.deconv=subpixel" || all=1
  probe_leg config3_xla config3 xla xla || all=1
  probe_leg config3_subpixel config3 xla subpixel || all=1
  probe_leg config3_c0s2d_decxla config3 s2d xla || all=1
  probe_leg config3_c0s2d_decsubpixel config3 s2d subpixel || all=1
  probe_leg config4_xla config4 xla xla || all=1
  probe_leg config4_c0s2d_decsubpixel config4 s2d subpixel || all=1
  probe_leg config5_xla config5 xla xla || all=1
  probe_leg config5_subpixel config5 xla subpixel || all=1
  probe_leg config5_c0s2d_decsubpixel config5 s2d subpixel || all=1
  return $all
}

for pass in 1 2 3 4 5 6 7 8; do
  [ "$(left)" -le 600 ] && break
  note "--- measured pass $pass ---"
  if measured_pass; then note "all measured legs done"; break; fi
done

# bench_warm: the exact driver command, retried like a leg.
for pass in 1 2 3; do
  leg_done bench_warm && break
  [ "$(left)" -le 800 ] && break
  wait_up_dl || break
  note "=== bench_warm ==="
  timeout 700 python bench.py >"$LOG/bench_warm.log" 2>&1
  note "bench_warm rc=$? $(tail -1 "$LOG/bench_warm.log")"
done

# kill/resume make-up PASS (r5e's leg), AFTER the measured legs: it wedges
# the lease ~10-15 min by design. Needs ~35 min of budget to be worth it.
if ! grep -q "^PASS" "$LOG/kill_resume.log" 2>/dev/null \
    && [ -f /tmp/r4_bair_fixture/data/clips.tfrecord ] \
    && [ "$(left)" -gt 2700 ] && wait_up_dl; then
  note "=== kill/resume STEPS=16384 ==="
  STEPS=16384 timeout $(( $(left) - 300 )) \
    bash scripts/r5_kill_resume.sh >"$LOG/kill_resume.log" 2>&1
  note "kill_resume rc=$? $(tail -2 "$LOG/kill_resume.log" | tr '\n' ' ')"
fi

# config5 1600-step quality run: retries RESUME from the every-400-step
# checkpoints (train --steps is a total-step target; resume is the default).
for attempt in 1 2 3 4 5 6; do
  [ -f "$LOG/c5_train.done" ] && break
  [ "$(left)" -le 900 ] && break
  wait_up_dl || break
  note "=== config5 quality train attempt $attempt ==="
  timeout $(( $(left) - 300 )) python -m action_conditioned_gans_tpu train \
    --preset config5 --workdir /tmp/r5_q_c5 --steps 1600 \
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
    [ "$(left)" -le 700 ] && break
    wait_up_dl || break
    note "=== sample (EMA) attempt $attempt ==="
    timeout $(( $(left) - 120 )) python -m action_conditioned_gans_tpu sample \
      --preset config5 --workdir /tmp/r5_q_c5 --ema --num-clips 4 \
      --out "$LOG/c5_samples" \
      --set train.disc_microbatch=120 --set train.steps_per_call=2 \
      --set train.ema_decay=0.999 >"$LOG/c5_sample.log" 2>&1
    rc=$?
    note "sample rc=$rc $(tail -1 "$LOG/c5_sample.log")"
    [ $rc -eq 0 ] && touch "$LOG/c5_sample.done"
  done
  for attempt in 1 2 3; do
    [ -f "$LOG/c5_eval.done" ] && break
    [ "$(left)" -le 700 ] && break
    wait_up_dl || break
    note "=== held-out eval (EMA) attempt $attempt ==="
    timeout $(( $(left) - 120 )) python -m action_conditioned_gans_tpu eval \
      --preset config5 --workdir /tmp/r5_q_c5 --ema \
      --set train.disc_microbatch=120 --set train.steps_per_call=2 \
      --set train.ema_decay=0.999 >"$LOG/c5_eval.log" 2>&1
    rc=$?
    note "eval rc=$rc $(tail -1 "$LOG/c5_eval.log")"
    [ $rc -eq 0 ] && touch "$LOG/c5_eval.done"
  done
fi

note "R5H RUNNER COMPLETE (left=$(left)s)"
rm -f /tmp/r5h_runner.pid
