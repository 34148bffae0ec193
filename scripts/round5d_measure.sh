#!/bin/bash
# Round-5d: the remaining round-5 on-chip matrix, priority-ordered so the
# headline lands even if the budget runs out. Same risk policy as
# round5_measure.sh: bank-first, canary every new kernel shape on a small
# layer, bound everything with timeout, artifacts to /tmp/r5d_*.log
# (stdout+stderr per stage, never piped).
#
# Stages (priority order):
#   1  canary: phase-shared MXU down-engine on L2 (smallest up=4 layer)
#   2  L10 mxu_shared at batch 8 (THE headline attack: VERDICT r4 #1b)
#   3  L10 per-plane mxu at fatter tile budgets (18/36 MB) + VPU control
#   4  L10 up=mxu (untested combination; ablation says ~50 ms ceiling)
#   5  full fwd matrix at batch 8, current defaults (bf16 tap truncation
#      re-measure vs the round-4 table)
#   6  full fwd matrix at batch 8 under mxu_shared (adoption decision for
#      the up=2 layers too)
#   7  L3 backward-MXU retry at the 20 MB fp32 tile budget (round-5 OOM fix)
#   8  end-to-end bench, current defaults (vs banked 8.3172)
#   9  batch-12 knee recheck (VERDICT r4 #9)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-18000}
T0=$(date +%s)
left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }
run_stage() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5d_${name}.log
  if [ "$(left)" -le 60 ]; then echo "SKIPPED (deadline): $name" >&2; return 2; fi
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:" >&2
  tail -25 "$log" >&2
  return $rc
}

run_stage probe 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('claim ok')" || { echo "TUNNEL WEDGED — abort" >&2; exit 1; }

# 1: canary the shared engine's kernel shapes on the cheapest up=4 layer.
run_stage mxus_canary 2400 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L2 || {
  echo "mxu_shared canary failed — skipping shared stages" >&2
  SKIP_SHARED=1; }

if [ -z "${SKIP_SHARED:-}" ]; then
  # 2: the headline — L10 under the shared engine, bench batch + batch 2.
  run_stage mxus_l10_b8 3600 env SG3TPU_FLRELU_DOWN=mxu_shared \
    python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
  run_stage mxus_l10_b2 2700 env SG3TPU_FLRELU_DOWN=mxu_shared \
    python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L10
fi

# 3: per-plane MXU with fatter tiles (round-4's 0.79x was at 9 MB; the MXU
# engine's dot dims quadruple with tile area) + VPU fat-tile control.
for bud in 18 36; do
  run_stage l10_downmxu_bud${bud}_b8 2700 env SG3TPU_FLRELU_DOWN=mxu \
    SG3TPU_FLRELU_BUDGET_MB=$bud \
    python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
done
run_stage l10_vpu_bud18_b8 2700 env SG3TPU_FLRELU_DOWN=vpu \
  SG3TPU_FLRELU_BUDGET_MB=18 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10

# 4: up=mxu on L10 (down stays vpu).
run_stage l10_upmxu_b8 2700 env SG3TPU_FLRELU_UP=mxu SG3TPU_FLRELU_DOWN=vpu \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10

# 5: full forward matrix, current defaults (bf16 up-tap truncation landed
# since the round-4 table; every bf16 layer recompiles).
run_stage fwd_b8_auto 7200 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4

# 6: full forward matrix under the shared engine (up=2 adoption check).
if [ -z "${SKIP_SHARED:-}" ]; then
  run_stage mxus_matrix_b8 7200 env SG3TPU_FLRELU_DOWN=mxu_shared \
    python scripts/microbench_flrelu.py --batch 8 --iters 4
fi

# 7: L3 backward MXU at the 20 MB fp32 budget (round-5 VMEM OOM fix).
run_stage l3_bwd_mxu_20mb 2400 env SG3TPU_FLRELU_DOWN_BWD=mxu \
  python scripts/microbench_flrelu.py --mode bwd --batch 1 --iters 8 \
  --layers L3

# 8: end-to-end bench with current defaults (banked round-4: 8.3172).
run_stage bench_default 5400 sh -c \
  'python bench.py > /tmp/r5d_bench.json 2>/tmp/r5d_bench.err'
cat /tmp/r5d_bench.json >&2

# 9: batch-12 knee recheck with auto engines.
run_stage bench_b12 5400 sh -c \
  'SG3TPU_BENCH_BATCH=12 python bench.py > /tmp/r5d_bench12.json 2>/tmp/r5d_bench12.err'
cat /tmp/r5d_bench12.json >&2

echo "ROUND5D DONE ($(left)s left)" >&2
