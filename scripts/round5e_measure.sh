#!/bin/bash
# Round-5e: L10 batch sweep for the batch-aware mxu_shared adoption.
# r5d measured the shared engine 1.15x on L10 at batch 2 but 0.96x at
# batch 8 — the win region is the low lane-occupancy regime (PTI batch 1,
# video/per-image batch 2). This sweep nails the crossover so
# `_auto_down_mode` can adopt per (up, n*c) with measurements at every
# adopted point, plus one last fat-tile attempt at b8.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-10800}
T0=$(date +%s)
left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }
run_stage() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5e_${name}.log
  if [ "$(left)" -le 60 ]; then echo "SKIPPED (deadline): $name" >&2; return 2; fi
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:" >&2
  tail -8 "$log" >&2
  return $rc
}

run_stage probe 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('claim ok')" || { echo "TUNNEL WEDGED — abort" >&2; exit 1; }

for b in 1 4; do
  run_stage mxus_l10_b${b} 2700 env SG3TPU_FLRELU_DOWN=mxu_shared \
    python scripts/microbench_flrelu.py --batch $b --iters 4 --layers L10
  run_stage vpu_l10_b${b} 2700 env SG3TPU_FLRELU_DOWN=vpu \
    python scripts/microbench_flrelu.py --batch $b --iters 4 --layers L10
done

# Last b8 attempt: the shared engine with a fatter tile budget (per-plane
# mxu got WORSE with budget; shared's dot shapes scale differently).
run_stage mxus_l10_bud18_b8 2700 env SG3TPU_FLRELU_DOWN=mxu_shared \
  SG3TPU_FLRELU_BUDGET_MB=18 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4 --layers L10

# Shared engine at batch 2 on the other hot layers (video/PTI regime: if
# shared beats the adopted per-plane mxu at b2 on up=2 too, the batch-aware
# rule covers them as well). Per-plane b2 numbers exist (round-4 table).
run_stage mxus_hot_b2 5400 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 \
  --layers L11,L12,L13

echo "ROUND5E DONE ($(left)s left)" >&2
