#!/bin/bash
# Round-5 on-chip measurement queue (VERDICT r4 next-steps 1, 2, 5, 7).
# Run ONLY when the tunnel canary passes; one TPU process at a time —
# strictly sequential legs, each timeout-bounded, each logged to $LOG.
# Results are curated into BASELINE.md / BENCH_*.json by hand afterwards.
#
# Order = VERDICT rank: the scoreboard legs (headline + the broken config5
# preset row) first so a tunnel flap costs the cheap tail, not the lede.
set -u
cd "$(dirname "$0")/.."
. scripts/r4_lib.sh
LOG=${LOG:-/tmp/r5_onchip}
mkdir -p "$LOG"
run() { # run <name> <timeout-s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  wait_up 3600 || { echo "SKIP $name (tunnel out)"; return 1; }
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  echo "rc=$? -> $LOG/$name.log"; tail -2 "$LOG/$name.log"
}

# 1. Driver metric at HEAD (next-step 1): bf16 moments, k=128. Expect
# >=46k f/s / vs_baseline >=2.15 per the r4 on-chip confirmation.
run bench_head 900 env ACGAN_BENCH_DEADLINE=840 python bench.py

# 2. Preset sweep refresh (next-step 1): turns BENCH_PRESETS.json's config5
# error object (pre-vma-fix artifact) into a measured row at HEAD.
run bench_presets 2400 env ACGAN_BENCH_DEADLINE=2100 python bench.py --presets

# 3. xplane anatomies for config3 and config4 (next-step 2; the two legs
# the r4 tunnel flap killed).
run prof_c3 900 python -m action_conditioned_gans_tpu train --preset config3 \
  --workdir /tmp/r5_prof_c3 --steps 40 --profile-steps 8
run prof_c3_report 300 python -m action_conditioned_gans_tpu profile-report \
  --workdir /tmp/r5_prof_c3 --json "$LOG/prof_c3.json"
run prof_c4 900 python -m action_conditioned_gans_tpu train --preset config4 \
  --workdir /tmp/r5_prof_c4 --steps 40 --profile-steps 8
run prof_c4_report 300 python -m action_conditioned_gans_tpu profile-report \
  --workdir /tmp/r5_prof_c4 --json "$LOG/prof_c4.json"

# 4. Persistent compile-cache probe (carried from r4, never ran): does the
# axon stack serialize/reload executables? Two short headline runs sharing
# one cache dir — run 2's compile_s << run 1's = yes. If yes, wiring
# ACGAN_COMPILE_CACHE_DIR into the driver-facing default buys 18-25 s of
# deadline budget per driver capture (VERDICT next-step 1).
rm -rf /tmp/r5_cc
run cache_cold 600 env ACGAN_BENCH_DEADLINE=540 ACGAN_BENCH_STEPS=8 \
  ACGAN_COMPILE_CACHE_DIR=/tmp/r5_cc python bench.py
run cache_warm 600 env ACGAN_BENCH_DEADLINE=540 ACGAN_BENCH_STEPS=8 \
  ACGAN_COMPILE_CACHE_DIR=/tmp/r5_cc python bench.py

# 5. Price the GAN-stability knobs at headline geometry (next-step 5;
# queued since r4 commit 9ddc68c, never measured). 24-step probes.
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
run bench_hinge 900 python - <<'EOF'
import dataclasses, json
from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import get_preset
cfg = get_preset("config1")
cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, gan_loss="hinge"))
print(json.dumps(run_bench(cfg, steps=24), default=str))
EOF

# 6. Drive `acgan serve` on real hardware once (next-step 7): checkpoint a
# tiny config1 run, export the AOT artifact, then measure request latency
# through the actual HTTP endpoint for both serving backends.
run serve_prep 900 bash scripts/r5_serve_leg.sh prep
run serve_live 900 bash scripts/r5_serve_leg.sh live
run serve_aot 900 bash scripts/r5_serve_leg.sh aot

echo "=== r5 queue done $(date -u +%H:%M:%S); file-source + quality runs are separate scripts ==="
