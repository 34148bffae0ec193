#!/bin/bash
# Round-5f: clean re-run of every round-5d timing stage that was polluted
# by a concurrent pytest run on this 1-core box (the tunnel client fights
# for the single core; fp32 layers with byte-identical kernels measured 3x
# round-4 — environmental, not code). All kernel compiles are cached, so
# these are execution-only re-measurements. RULE (learned): never run
# CPU-heavy work concurrently with chip timing on this host.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-7200}
T0=$(date +%s)
left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }
run_stage() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5f_${name}.log
  if [ "$(left)" -le 60 ]; then echo "SKIPPED (deadline): $name" >&2; return 2; fi
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:" >&2
  tail -6 "$log" >&2
  return $rc
}

run_stage probe 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('claim ok')" || { echo "TUNNEL WEDGED — abort" >&2; exit 1; }

# Clean L10 attack numbers (all cached compiles).
run_stage vpu_l10_b8 1800 env SG3TPU_FLRELU_DOWN=vpu \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
run_stage mxus_l10_b8 1800 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
run_stage mxus_l10_b2 1800 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L10
run_stage vpu_l10_b2 1800 env SG3TPU_FLRELU_DOWN=vpu \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L10
run_stage l10_upmxu_b8 1800 env SG3TPU_FLRELU_UP=mxu SG3TPU_FLRELU_DOWN=vpu \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
run_stage l10_downmxu_bud18_b8 1800 env SG3TPU_FLRELU_DOWN=mxu \
  SG3TPU_FLRELU_BUDGET_MB=18 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
run_stage mxus_l10_bud18_b8 2400 env SG3TPU_FLRELU_DOWN=mxu_shared \
  SG3TPU_FLRELU_BUDGET_MB=18 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10
run_stage mxus_canary_b2 1800 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L2

# Full matrices, idle host.
run_stage fwd_b8_auto 5400 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4
run_stage mxus_matrix_b8 5400 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 8 --iters 4

echo "ROUND5F DONE ($(left)s left)" >&2
