#!/bin/bash
# Round-5 session-5 harvest: the r5h runner's 03:30 deadline gate will skip
# the config5 sample/eval legs even when the 1600-step train completes in
# time (they require >700 s of remaining budget). This follow-up waits for
# r5h to exit (chip free), then runs EXACTLY those two legs under its own
# hard deadline, resuming the train first if it fell short of 1600 steps.
# Deadline default now+75min — leaves the chip free well before any
# plausible driver end-of-round bench capture.
# Stop cleanly with: PIDFILE=/tmp/r5i_harvest.pid bash scripts/r4_stop.sh
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5h}
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 4500 ))}
echo $$ >/tmp/r5i_harvest.pid
note() { echo "$* $(date -u +%F' '%T)" | tee -a "$LOG/harvest.log"; }
left() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
note "r5i_harvest start; deadline $(date -u -d @"$DEADLINE_EPOCH" +%F' '%T)"

# Wait for the r5h runner to release the chip (rule 2: single tenant).
while [ -f /tmp/r5h_runner.pid ] \
    && kill -0 "$(cat /tmp/r5h_runner.pid)" 2>/dev/null; do
  [ "$(left)" -le 900 ] && { note "gave up waiting for r5h"; exit 1; }
  sleep 30
done
note "r5h runner exited; chip free"

wait_up_dl() {
  local l; l=$(left)
  [ "$l" -le 180 ] && return 1
  wait_up $(( l - 120 ))
}

C5_SET=(--set train.disc_microbatch=120 --set train.steps_per_call=2
        --set train.ema_decay=0.999)

# Finish the train if the runner's deadline cut it short (resume is the
# default; --steps is a total-step target so a completed run exits fast).
for attempt in 1 2 3; do
  [ -f "$LOG/c5_train.done" ] && break
  [ "$(left)" -le 900 ] && break
  wait_up_dl || break
  note "=== harvest: train-to-1600 attempt $attempt ==="
  timeout $(( $(left) - 600 )) python -m action_conditioned_gans_tpu train \
    --preset config5 --workdir /tmp/r5_q_c5 --steps 1600 \
    "${C5_SET[@]}" \
    --set train.log_every=100 --set train.sample_every=400 \
    --set train.checkpoint_every=400 >>"$LOG/c5_train.log" 2>&1
  rc=$?
  note "train rc=$rc $(grep -E '\"step\"' "$LOG/c5_train.log" | tail -1)"
  [ $rc -eq 0 ] && touch "$LOG/c5_train.done"
done

for attempt in 1 2 3; do
  [ -f "$LOG/c5_sample.done" ] && break
  [ "$(left)" -le 400 ] && break
  wait_up_dl || break
  note "=== harvest: sample (EMA) attempt $attempt ==="
  timeout $(( $(left) - 120 )) python -m action_conditioned_gans_tpu sample \
    --preset config5 --workdir /tmp/r5_q_c5 --ema --num-clips 4 \
    --out "$LOG/c5_samples" "${C5_SET[@]}" >"$LOG/c5_sample.log" 2>&1
  rc=$?
  note "sample rc=$rc $(tail -1 "$LOG/c5_sample.log")"
  [ $rc -eq 0 ] && touch "$LOG/c5_sample.done"
done

for attempt in 1 2 3; do
  [ -f "$LOG/c5_eval.done" ] && break
  [ "$(left)" -le 300 ] && break
  wait_up_dl || break
  note "=== harvest: held-out eval (EMA) attempt $attempt ==="
  timeout $(( $(left) - 120 )) python -m action_conditioned_gans_tpu eval \
    --preset config5 --workdir /tmp/r5_q_c5 --ema \
    "${C5_SET[@]}" >"$LOG/c5_eval.log" 2>&1
  rc=$?
  note "eval rc=$rc $(tail -1 "$LOG/c5_eval.log")"
  [ $rc -eq 0 ] && touch "$LOG/c5_eval.done"
done

note "R5I HARVEST COMPLETE (left=$(left)s)"
rm -f /tmp/r5i_harvest.pid
