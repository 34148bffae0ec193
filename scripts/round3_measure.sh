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
timeout 2400 python scripts/bench_train_steps.py --what setgan || true

echo "=== stage 4: MXU canary (L13 only — smallest hot layer) ==="
[ "$(date +%s)" -lt 1787115780 ] && SG3TPU_FLRELU_DOWN=mxu timeout 1400 python scripts/microbench_flrelu.py --impl fused --layers L13 || echo "mxu canary skipped/failed"

echo "=== stage 5: MXU hot layers (deadline-guarded) ==="
[ "$(date +%s)" -lt 1787116080 ] && SG3TPU_FLRELU_DOWN=mxu timeout 1200 python scripts/microbench_flrelu.py --impl fused --layers L10,L11,L12 || echo "mxu hot skipped/failed"
[ "$(date +%s)" -lt 1787116080 ] && SG3TPU_FLRELU_DOWN=mxu SG3TPU_FLRELU_UP=mxu timeout 1200 python scripts/microbench_flrelu.py --impl fused --layers L11,L13 || echo "mxu updown skipped/failed"

echo "=== stage 2c: video e2e (only if time remains) ==="
[ "$(date +%s)" -lt 1787116380 ] && timeout 1200 python scripts/bench_video.py || echo "video skipped/failed"
echo "done $(date)"
