# Shared helpers for the round-4 on-chip queue scripts. Source from a
# script whose cwd is the repo root.
#
# wait_up BUDGET_S — poll the subprocess canary (doctor.device_probe: tiny
# jit + compile + execute + fetch) until it passes or the budget is spent.
# Returns 0 when the tunnel answers, 1 when the budget ran out. Used
# between queue legs so a MID-QUEUE outage pauses the queue instead of
# burning every remaining leg's timeout against a dead tunnel (r4: the
# r3→r4 outage lasted hours and came back in flaps).
wait_up() {
  local budget=${1:-3600} start
  start=$(date +%s)
  while true; do
    if timeout 150 python - <<'EOF' >/dev/null 2>&1
from action_conditioned_gans_tpu.utils.doctor import device_probe
r = device_probe(120)
assert r.get("ok") and r.get("platform") != "cpu", r
EOF
    then return 0; fi
    if [ $(($(date +%s) - start)) -ge "$budget" ]; then
      echo "wait_up: tunnel still out after ${budget}s — giving up this leg"
      return 1
    fi
    echo "wait_up: tunnel out ($(date -u +%H:%M:%S)); re-probing in 120s"
    sleep 120
  done
}
