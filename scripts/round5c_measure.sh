#!/bin/bash
# Round-5c: training-step + application north-stars after the round-5 code
# changes. Run AFTER round5_measure.sh / round5b_measure.sh.
#
# Stages:
#   1  SetGAN stem batch 4 with frozen-trunk remat (the canonical per-GPU
#      batch; VERDICT r4 #4 — previously 554MB over 16GB HBM)
#   2  SetGAN stem batch 2 with remat (cost check vs the banked 0.54 s/step)
#   3  video inversion+edit at frame-batch 4 and 6 with --stages
#      (dual decode doubles the 1024² synthesis batch, so frame-batch 8
#      would hit the measured batch-16 HBM OOM; 6 -> 12 is the boundary)
#   4  PTI + coach train steps (re-bench; with bwd engine adoption if wired)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache

BUDGET_S=${BUDGET_S:-10800}
T0=$(date +%s)
left() { echo $(( BUDGET_S - ($(date +%s) - T0) )); }
run_stage() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/r5c_${name}.log
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

# L3 backward at the new fp32+MXU 20MB tile budget (round-5 VMEM OOM fix).
run_stage l3_bwd_mxu_20mb 2400 env SG3TPU_FLRELU_DOWN_BWD=mxu \
  python scripts/microbench_flrelu.py --mode bwd --batch 1 --iters 8 \
  --layers L3

run_stage setgan_b4_remat 5400 python scripts/bench_train_steps.py \
  --what setgan --batch 4 --d_remat_features --iters 4

run_stage setgan_b2_remat 3600 python scripts/bench_train_steps.py \
  --what setgan --batch 2 --d_remat_features --iters 4

run_stage video_b4 4800 python scripts/bench_video.py --batch 4 --iters 2 --stages
run_stage video_b6 4800 python scripts/bench_video.py --batch 6 --iters 2

run_stage pti_step 3600 python scripts/bench_train_steps.py --what pti
run_stage coach_step 3600 python scripts/bench_train_steps.py --what coach

echo "ROUND5C DONE ($(left)s left)" >&2
