#!/bin/bash
# Staged round-4 measurement plan for the single axon TPU chip.
#
# Ordering is a RISK policy, not a convenience: a wedge-class Mosaic compile
# (see memory/axon-tpu-environment-traps) can hold the single chip's claim
# for hours, so the known-good artifacts are banked BEFORE any new kernel
# shape is compiled, and the MXU down-pass engine is canaried on the
# smallest hot layer before anything larger. If the canary fails, ALL later
# MXU stages are skipped (hard policy — a failed canary means the engine
# wedges this environment's remote compiler).
#
# Deadlines are RELATIVE to script start (ADVICE r3: never bake absolute
# epochs). Override the total budget with BUDGET_S (default 4 hours).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache
LOG=/tmp/round4_measure.log
exec > >(tee -a "$LOG") 2>&1

START_S=$(date +%s)
BUDGET_S=${BUDGET_S:-14400}
DEADLINE_S=$((START_S + BUDGET_S))

# run_stage <remaining-seconds-needed> <timeout> <desc> <cmd...>
# Distinguishes a deadline SKIP from a real FAILURE in the log (ADVICE r3).
run_stage() {
  local need=$1 tmo=$2 desc=$3; shift 3
  local now; now=$(date +%s)
  if [ $((DEADLINE_S - now)) -lt "$need" ]; then
    echo "SKIPPED (deadline): $desc"
    return 100
  fi
  if ! timeout "$tmo" "$@"; then
    echo "FAILED: $desc"
    return 1
  fi
  return 0
}

echo "=== stage 0: tunnel probe $(date) ==="
if ! timeout 180 python -c "import jax; assert any(d.platform=='tpu' for d in jax.devices()); print('tpu ok')"; then
  echo "FAILED: tunnel probe — aborting"; exit 1
fi

echo "=== stage 1: bank default bench (fused vpu, batch 8) ==="
# Redirect INSIDE run_stage's command (a `| tee` pipeline would discard the
# stage's exit status and write skip/fail markers into the JSON artifact).
run_stage 600 5400 "default bench" sh -c 'python bench.py > /tmp/bench_r4_default.json 2>&1'
cat /tmp/bench_r4_default.json

echo "=== stage 2: steady-state train steps (fused backward) ==="
run_stage 600 5400 "pti train step" python scripts/bench_train_steps.py --what pti --backward fused
run_stage 600 5400 "coach train step" python scripts/bench_train_steps.py --what coach --backward fused

echo "=== stage 3: SetGAN stem steady-state step (sec/kimg) ==="
# --batch 2: the largest setgan batch that fits one 16GB v5e (ROUND4.md).
run_stage 600 2400 "setgan sec/kimg" python scripts/bench_train_steps.py --what setgan --batch 2

echo "=== stage 4: video e2e fps ==="
run_stage 600 2400 "video e2e" python scripts/bench_video.py

echo "=== stage 5: MXU canary (L13 only — smallest hot layer) ==="
MXU_OK=1
if ! run_stage 900 1400 "mxu canary L13" env SG3TPU_FLRELU_DOWN=mxu \
     python scripts/microbench_flrelu.py --impl fused --layers L13; then
  MXU_OK=0
  echo "MXU canary did not pass — skipping ALL later MXU stages (risk policy)"
fi

if [ "$MXU_OK" = 1 ]; then
  echo "=== stage 6: MXU hot layers ==="
  run_stage 900 2400 "mxu down L10-L12" env SG3TPU_FLRELU_DOWN=mxu \
    python scripts/microbench_flrelu.py --impl fused --layers L10,L11,L12
  run_stage 900 2400 "mxu up+down L11,L13" env SG3TPU_FLRELU_DOWN=mxu SG3TPU_FLRELU_UP=mxu \
    python scripts/microbench_flrelu.py --impl fused --layers L11,L13
else
  echo "=== stage 6: SKIPPED (canary failed) ==="
fi

echo "done $(date) (elapsed $(( $(date +%s) - START_S ))s)"
