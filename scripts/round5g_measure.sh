#!/bin/bash
# Round-5g: confirm the round-5 engine adoptions + application north-stars.
#
# Stages:
#   1  L9 batch-2 shared vs vpu (closes the low-batch gate on the L9 entry)
#   2  L11 batch-1 shared vs per-plane mxu (PTI regime of the new adoption)
#   3  full fwd matrix at batch 8 under the NEW auto (confirm: L9 ~104,
#      L10 ~250, L11 ~123, everything else unchanged)
#   4  end-to-end bench with the new auto (banked round-5d: 8.3781)
#   5  video at frame-batch 2 (single program, round-4-comparable) + stages
#   6  video at frame-batch 4 and 6, split-program (single program needs
#      19.35G HBM at fb4 — measured round-5c)
#   7  SetGAN stem batch 2 + batch 4 with the FIXED d_remat_features
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-14400}
T0=$(date +%s)
left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }
run_stage() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5g_${name}.log
  if [ "$(left)" -le 60 ]; then echo "SKIPPED (deadline): $name" >&2; return 2; fi
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:" >&2
  tail -10 "$log" >&2
  return $rc
}

run_stage probe 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('claim ok')" || { echo "TUNNEL WEDGED — abort" >&2; exit 1; }

run_stage mxus_l9_b2 2700 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L9
run_stage vpu_l9_b2 2700 env SG3TPU_FLRELU_DOWN=vpu \
  python scripts/microbench_flrelu.py --batch 2 --iters 4 --layers L9

run_stage mxus_l11_b1 2700 env SG3TPU_FLRELU_DOWN=mxu_shared \
  python scripts/microbench_flrelu.py --batch 1 --iters 4 --layers L11
run_stage mxu_l11_b1 2700 env SG3TPU_FLRELU_DOWN=mxu \
  python scripts/microbench_flrelu.py --batch 1 --iters 4 --layers L11

run_stage fwd_b8_confirm 5400 \
  python scripts/microbench_flrelu.py --batch 8 --iters 4

run_stage bench_newauto 5400 sh -c \
  'python bench.py > /tmp/r5g_bench.json 2>/tmp/r5g_bench.err'
cat /tmp/r5g_bench.json >&2

run_stage video_b2 4800 python scripts/bench_video.py --batch 2 --iters 2 --stages
run_stage video_b4_split 4800 python scripts/bench_video.py --batch 4 --iters 2 --split --stages
run_stage video_b6_split 4800 python scripts/bench_video.py --batch 6 --iters 2 --split --stages

run_stage setgan_b2_remat 4800 python scripts/bench_train_steps.py \
  --what setgan --batch 2 --d_remat_features --iters 4
run_stage setgan_b4_remat 5400 python scripts/bench_train_steps.py \
  --what setgan --batch 4 --d_remat_features --iters 4

echo "ROUND5G DONE ($(left)s left)" >&2
