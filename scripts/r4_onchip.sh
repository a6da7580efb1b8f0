#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 next-steps 1b, 2, 3, 4, 6).
# Run ONLY when the tunnel canary passes (acgan doctor / bench.py canary);
# one TPU process at a time — steps are strictly sequential. Each step is
# timeout-bounded and logs to $LOG so a mid-queue wedge loses one step, not
# the session. Results go to BASELINE.md tables by hand afterwards.
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r4_onchip}
mkdir -p "$LOG"
run() { # run <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  # Pause here (up to 1h) if the tunnel dropped between legs — better a
  # late measurement than a full-timeout zero per remaining leg.
  wait_up 3600 || { echo "SKIP $name (tunnel out)"; return 1; }
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$? -> $LOG/$name.log"; tail -2 "$LOG/$name.log"
}

# 1. Driver metric at HEAD (VERDICT next-step 1b): bf16 moments, k=128.
run bench_head 900 env ACGAN_BENCH_DEADLINE=840 python bench.py

# 2a. wgrad=patches A/B at headline geometry (next-step 2).
run bench_wgrad_patches 900 env ACGAN_BENCH_DEADLINE=840 \
  ACGAN_BENCH_OVERRIDES="train.adam_moment_dtype=bfloat16 model.wgrad=patches" \
  python bench.py

# 2b. config3 geometry (deepest D -> most wgrad time), default vs patches.
run bench_c3_default 900 python - <<'EOF'
import json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
print(json.dumps(run_bench(get_preset("config3"), steps=24), default=str))
EOF
run bench_c3_patches 900 python - <<'EOF'
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("config3")
cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, wgrad="patches"))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF

# 3. Preset sweep refresh at HEAD (next-step 3) + serving bench.
run bench_presets 2400 env ACGAN_BENCH_DEADLINE=2100 python bench.py --presets
run bench_infer 1200 env ACGAN_BENCH_DEADLINE=1100 python bench.py --infer

# 4. xplane anatomies for config3 and config4 (next-step 3).
run prof_c3 900 python -m action_conditioned_gans_tpu train --preset config3 \
  --workdir /tmp/r4_prof_c3 --steps 40 --profile-steps 8
run prof_c3_report 300 python -m action_conditioned_gans_tpu profile-report \
  --workdir /tmp/r4_prof_c3 --json "$LOG/prof_c3.json"
run prof_c4 900 python -m action_conditioned_gans_tpu train --preset config4 \
  --workdir /tmp/r4_prof_c4 --steps 40 --profile-steps 8
run prof_c4_report 300 python -m action_conditioned_gans_tpu profile-report \
  --workdir /tmp/r4_prof_c4 --json "$LOG/prof_c4.json"

# 5. Persistent compile-cache probe (r4 feature, utils/compile_cache.py):
# does the axon stack serialize/reload executables? Two short headline runs
# sharing one cache dir — run 2's compile_s << run 1's = yes; an error on
# run 2 = the helper rejects deserialization (record either way; the knob
# is opt-in and this probe runs AFTER every real measurement above).
rm -rf /tmp/r4_cc
run cache_cold 600 env ACGAN_BENCH_DEADLINE=540 ACGAN_BENCH_STEPS=8 \
  ACGAN_COMPILE_CACHE_DIR=/tmp/r4_cc python bench.py
run cache_warm 600 env ACGAN_BENCH_DEADLINE=540 ACGAN_BENCH_STEPS=8 \
  ACGAN_COMPILE_CACHE_DIR=/tmp/r4_cc python bench.py

# 6. Price the session-4 GAN-stability knobs at headline geometry (24-step
# probes; honest cost rows for BASELINE.md — each adds documented work:
# R1 = one extra D fwd+bwd + 2nd-order, augment = elementwise transforms,
# SN = a few matvecs/layer).
run bench_r1 900 python - <<'EOF'
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("config1")
cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, r1_weight=10.0))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF
run bench_augment 900 python - <<'EOF'
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("config1")
cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, d_augment="color,translation,cutout"))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF
run bench_sn 900 python - <<'EOF'
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("config1")
cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, d_spectral_norm=True))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF

echo "=== queue done $(date -u +%H:%M:%S); file-source + quality runs are separate scripts ==="
