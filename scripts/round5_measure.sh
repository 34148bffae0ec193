#!/bin/bash
# Round-5 staged TPU measurement plan. Risk policy (memory:
# axon-tpu-environment-traps): bank known-good numbers FIRST, canary every
# new kernel shape on a small layer before a full matrix, bound everything
# with timeout so a wedge never holds the chip's claim, deadlines RELATIVE
# to script start. Artifacts land in /tmp/r5_*.log (stdout+stderr per
# stage, never piped — a failed stage must not corrupt an artifact).
#
# Stages:
#   1  bank: bwd VPU matrix, batch 1 (train-step geometry; mostly cached)
#   2  canary: bwd MXU on L13 (smallest hot layer), batch 1
#   3  bwd MXU matrix, batch 1
#   4  bwd both engines on hot layers at batch 8 (generality check)
#   5  L10 fwd ablation at batch 8 (up/down x h/w stage shares)
#   6  batch-12 knee recheck with auto engines (VERDICT r4 #9)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-14400}
T0=$(date +%s)

left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5_${name}.log
  if [ "$(left)" -le 60 ]; then
    echo "SKIPPED (deadline): $name" >&2
    return 2
  fi
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:" >&2
  tail -20 "$log" >&2
  return $rc
}

# Probe: execution via the cached matmul path first (claim check), then one
# small FRESH compile (queue check). Generous timeout — 2026-08-19 22:25 a
# trivial compile took 81 s through the tunnel; 420 s false-aborted twice.
run_stage probe 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('claim ok')
print(float(jax.jit(lambda a: (a @ a).sum())(x)))" || {
  echo "TUNNEL WEDGED — aborting round5 measurements" >&2; exit 1; }

# Stage 1: bank the backward VPU matrix at batch 1.
run_stage bwd_vpu_b1 5400 env SG3TPU_FLRELU_DOWN_BWD=vpu \
  python scripts/microbench_flrelu.py --mode bwd --batch 1 --iters 8

# Stage 2: canary backward MXU on L13 only.
run_stage bwd_mxu_canary 2400 env SG3TPU_FLRELU_DOWN_BWD=mxu \
  python scripts/microbench_flrelu.py --mode bwd --batch 1 --iters 8 \
  --layers L13 || {
  echo "MXU bwd canary failed — skipping MXU matrix stages" >&2
  SKIP_MXU=1; }

# Stage 3: full backward MXU matrix at batch 1.
if [ "${SKIP_MXU:-0}" != "1" ]; then
  run_stage bwd_mxu_b1 7200 env SG3TPU_FLRELU_DOWN_BWD=mxu \
    python scripts/microbench_flrelu.py --mode bwd --batch 1 --iters 8
fi

# Stage 4: hot layers at batch 8, both engines (fold changes occupancy).
run_stage bwd_vpu_b8 3600 env SG3TPU_FLRELU_DOWN_BWD=vpu \
  python scripts/microbench_flrelu.py --mode bwd --batch 8 --iters 4 \
  --layers L6,L8,L10,L11,L12,L13
if [ "${SKIP_MXU:-0}" != "1" ]; then
  run_stage bwd_mxu_b8 3600 env SG3TPU_FLRELU_DOWN_BWD=mxu \
    python scripts/microbench_flrelu.py --mode bwd --batch 8 --iters 4 \
    --layers L6,L8,L10,L11,L12,L13
fi

# Stage 5: L10 forward stage ablation at batch 8 (auto engines). Each
# ablation is a distinct kernel body -> new compile; L10-only keeps it cheap.
run_stage l10_base 2400 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
for ab in upw uph downw downh upw,uph downw,downh; do
  run_stage "l10_ab_${ab//,/+}" 2400 env SG3TPU_FLRELU_ABLATE=$ab \
    python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
done

# Stage 6: batch-12 knee recheck with the adopted auto engines.
run_stage knee_b12 3600 env SG3TPU_BENCH_BATCH=12 python bench.py

echo "ROUND5 MEASURE DONE ($(left)s budget left)" >&2
