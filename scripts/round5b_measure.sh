#!/bin/bash
# Round-5b: L10 attack + re-bench after the bf16 up-tap truncation change.
# Run AFTER scripts/round5_measure.sh (bank-first policy). Same stage
# pattern: artifacts in /tmp/r5b_*.log, relative deadlines, canary-first.
#
# Stages:
#   1  fwd matrix at batch 8 with the new default (up-tap truncation on
#      bf16 layers) — per-layer comparison vs the round-4 table
#   2  L10 up=mxu down=vpu (the untested combination), batch 8 + batch 2
#   3  L10 up=mxu with a 18MB VMEM budget (reg-pressure hypothesis)
#   4  end-to-end bench with new defaults (must beat the banked 8.3068)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-10800}
T0=$(date +%s)
left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }
run_stage() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5b_${name}.log
  if [ "$(left)" -le 60 ]; then echo "SKIPPED (deadline): $name" >&2; return 2; fi
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:" >&2
  tail -20 "$log" >&2
  return $rc
}

run_stage probe 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('claim ok')" || { echo "TUNNEL WEDGED — abort" >&2; exit 1; }

# Stage 0b: retry the L3 backward-MXU compile failure with full error
# capture (round-5 shootout: opaque HTTP 500; every sibling geometry
# compiled — suspected transient).
run_stage l3_bwd_mxu_retry 2400 env SG3TPU_FLRELU_DOWN_BWD=mxu \
  python scripts/microbench_flrelu.py --mode bwd --batch 1 --iters 8 \
  --layers L3

# Stage 1: full forward matrix, new defaults (bf16 layers recompile).
run_stage fwd_b8_trunc 7200 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4

# Stage 2: L10 down-pass attack. Ablation (round-5, /tmp/r5_l10_ab_*.log)
# says the down-W stage alone is ~115-134 ms of L10's 253 ms at batch 8 and
# the whole up-pass only ~50 ms — so the lever is making the 4-phase
# down-MXU viable. Round-4 measured it 0.79x at the default 9 MB tile
# budget ([16, ~20] dots = ~2% MXU utilization); fatter tiles quadruple
# both dot dims. The 9 MB plateau was a VPU-scheduling result — re-test
# under the MXU engine.
for bud in 18 36; do
  run_stage l10_downmxu_bud${bud}_b8 2700 env SG3TPU_FLRELU_DOWN=mxu \
    SG3TPU_FLRELU_BUDGET_MB=$bud \
    python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
done
# VPU down at budget 18 (control: does L10-VPU also like fatter tiles?)
run_stage l10_vpu_bud18_b8 2700 env SG3TPU_FLRELU_DOWN=vpu \
  SG3TPU_FLRELU_BUDGET_MB=18 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
# Up=mxu sanity point (cheap; theory says ~50 ms ceiling on the win)
run_stage l10_upmxu_b8 2700 env SG3TPU_FLRELU_UP=mxu SG3TPU_FLRELU_DOWN=vpu \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10

# Stage 4: end-to-end with new defaults.
run_stage bench_trunc 5400 sh -c 'python bench.py > /tmp/r5b_bench.json 2>/tmp/r5b_bench.err'
cat /tmp/r5b_bench.json >&2

echo "ROUND5B DONE ($(left)s left)" >&2
