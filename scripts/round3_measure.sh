#!/bin/bash
# Staged round-3 measurement plan — run after the axon tunnel recovers.
#
# Ordering is a RISK policy, not a convenience: a wedge-class Mosaic compile
# (see memory/axon-tpu-environment-traps) can hold the single chip's claim
# for hours, so the known-good artifacts are banked BEFORE any new kernel
# shape is compiled, and the MXU down-pass engine is canaried on the
# smallest hot layer before the full matrix.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache
LOG=/tmp/round3_measure.log
exec > >(tee -a "$LOG") 2>&1

echo "=== stage 0: tunnel probe $(date) ==="
timeout 180 python -c "import jax; assert any(d.platform=='tpu' for d in jax.devices()); print('tpu ok')" || {
  echo "tunnel still down"; exit 1; }

echo "=== stage 1: bank default bench (fused vpu, batch 8) ==="
timeout 5400 python bench.py | tee /tmp/bench_r3_default.json

echo "=== stage 2: steady-state train steps (fused backward) ==="
timeout 5400 python scripts/bench_train_steps.py --what pti --backward fused || true
timeout 5400 python scripts/bench_train_steps.py --what coach --backward fused || true

echo "=== stage 2b: SetGAN stem steady-state step (sec/kimg) ==="
timeout 7200 python scripts/bench_train_steps.py --what setgan || true

echo "=== stage 2c: video inversion+edit end-to-end (frames/sec) ==="
timeout 7200 python scripts/bench_video.py || true

echo "=== stage 3: per-layer VPU baseline refresh (hot layers) ==="
timeout 5400 python scripts/microbench_flrelu.py --impl fused --layers L10,L11,L13 || true

echo "=== stage 4: MXU canary (L13 only — smallest hot layer) ==="
SG3TPU_FLRELU_DOWN=mxu timeout 3600 python scripts/microbench_flrelu.py \
  --impl fused --layers L13 || { echo "MXU canary failed/wedged — STOP"; exit 2; }

echo "=== stage 5: MXU full matrix ==="
for mode in mxu mxu_bf16; do
  SG3TPU_FLRELU_DOWN=$mode timeout 7200 python scripts/microbench_flrelu.py \
    --impl fused || true
done
SG3TPU_FLRELU_DOWN=mxu SG3TPU_FLRELU_UP=mxu timeout 7200 \
  python scripts/microbench_flrelu.py --impl fused || true

echo "=== stage 6: end-to-end with MXU engines ==="
SG3TPU_FLRELU_DOWN=mxu timeout 5400 python bench.py || true
SG3TPU_FLRELU_DOWN=mxu SG3TPU_FLRELU_UP=mxu timeout 5400 python bench.py || true
echo "done $(date)"
