#!/bin/bash
# Round-5 serving-on-chip leg (VERDICT r4 next-step 7 / weak 5): drive the
# actual `acgan serve` HTTP endpoint against the real chip once, for both
# serving backends (live checkpoint Predictor and the AOT artifact), and
# record endpoint-measured request latency next to BENCH_INFER's device
# numbers. Three sub-commands so the queue's wait_up gate sits between them:
#   prep — train a tiny config1 checkpoint + export the .aot artifact
#   live — serve the checkpoint, bench /predict + /rollout over HTTP
#   aot  — serve the artifact, same bench
# The server is the ONE TPU process (CLAUDE.md rule 2); the client process
# is host-only (serve.client_* are urllib+numpy). SIGTERM-only shutdown
# (rule 3: SIGKILL on a TPU holder wedges the lease).
set -u
cd "$(dirname "$0")/.."
WD=/tmp/r5_serve_wd
PORT=8701
MODE=${1:?usage: r5_serve_leg.sh prep|live|aot}

if [ "$MODE" = prep ]; then
  rm -rf "$WD"
  python -m action_conditioned_gans_tpu train --preset config1 \
    --workdir "$WD" --steps 32 --set train.checkpoint_every=32 \
    --set train.sample_every=0 --set train.log_every=16
  python -m action_conditioned_gans_tpu export --preset config1 \
    --workdir "$WD" --format stablehlo --rollout-length 10 \
    --out "$WD/artifact.aot"
  exit $?
fi

if [ "$MODE" = live ]; then
  SERVE_ARGS=(--preset config1 --workdir "$WD")
elif [ "$MODE" = aot ]; then
  SERVE_ARGS=(--artifact "$WD/artifact.aot")
else
  echo "unknown mode $MODE"; exit 2
fi

python -m action_conditioned_gans_tpu serve "${SERVE_ARGS[@]}" \
  --port "$PORT" >"/tmp/r5_serve_${MODE}_server.log" 2>&1 &
SPID=$!
trap 'kill -TERM $SPID 2>/dev/null; wait $SPID 2>/dev/null' EXIT

python - "$MODE" "$PORT" <<'EOF'
# Host-only HTTP client bench: serve.client_* are urllib+numpy; force the
# CPU platform anyway so an accidental jax import in this process can never
# contend for the chip the server holds (CLAUDE.md rules 2/6).
import json, sys, time
import numpy as np
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
from action_conditioned_gans_tpu.serve import client_predict, client_rollout

mode, port = sys.argv[1], int(sys.argv[2])
base = f"http://127.0.0.1:{port}"
import urllib.request

deadline = time.time() + 600  # server start + first-compile can take minutes
while True:
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            meta = json.load(r)
        break
    except Exception:
        if time.time() > deadline:
            print(json.dumps({"error": f"[serve:{mode}] healthz never came up"}))
            sys.exit(1)
        time.sleep(5)

B, T = 128, 10
rng = np.random.default_rng(0)
frame = rng.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32)
action = rng.uniform(-1, 1, (B, 4)).astype(np.float32)
actions = rng.uniform(-1, 1, (B, T, 4)).astype(np.float32)

# Warmup (first request pays jit compile on the live path).
t0 = time.time(); client_predict(base, frame, action); warm_predict = time.time() - t0
t0 = time.time(); client_rollout(base, frame, actions); warm_rollout = time.time() - t0

def timed(fn, n):
    xs = []
    for _ in range(n):
        t0 = time.time(); fn(); xs.append((time.time() - t0) * 1e3)
    return float(np.percentile(xs, 50)), float(np.percentile(xs, 90))

p50_p, p90_p = timed(lambda: client_predict(base, frame, action), 20)
p50_r, p90_r = timed(lambda: client_rollout(base, frame, actions), 10)
# ?encoding=uint8 A/B: same requests, 4x smaller response bodies — prices
# the npz/transport share the r5 serve leg measured to dominate.
p50_p8, p90_p8 = timed(
    lambda: client_predict(base, frame, action, encoding="uint8"), 20)
p50_r8, p90_r8 = timed(
    lambda: client_rollout(base, frame, actions, encoding="uint8"), 10)
print(json.dumps({
    "mode": mode, "backend": meta.get("backend"), "device": meta.get("device"),
    "batch": B, "rollout": T,
    "warmup_predict_s": round(warm_predict, 2), "warmup_rollout_s": round(warm_rollout, 2),
    "http_predict_p50_ms": round(p50_p, 1), "http_predict_p90_ms": round(p90_p, 1),
    "http_rollout_p50_ms": round(p50_r, 1), "http_rollout_p90_ms": round(p90_r, 1),
    "http_predict_uint8_p50_ms": round(p50_p8, 1), "http_predict_uint8_p90_ms": round(p90_p8, 1),
    "http_rollout_uint8_p50_ms": round(p50_r8, 1), "http_rollout_uint8_p90_ms": round(p90_r8, 1),
}))
EOF
RC=$?
kill -TERM $SPID 2>/dev/null
wait $SPID 2>/dev/null
trap - EXIT
exit $RC
