#!/bin/bash
# Round-4 stage B: batch-8 per-layer engine shootout (the end-to-end bench
# runs batch 8, so adoption decisions must be batch-8 numbers, not batch-2).
# Risk policy as in round4_measure.sh: canary the smallest new MXU shape
# first; every stage timeout-bounded so a wedge exits cleanly.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/sg3tpu_tpu_cache
LOG=/tmp/round4c.log
exec > >(tee -a "$LOG") 2>&1

echo "=== probe $(date) ==="
if ! timeout 180 python -c "import jax; assert any(d.platform=='tpu' for d in jax.devices()); print('tpu ok')"; then
  echo "FAILED: tunnel probe — aborting"; exit 1
fi

echo "=== b1: mxu canary L13 batch 8 $(date) ==="
if ! timeout 1200 env SG3TPU_FLRELU_DOWN=mxu \
     python scripts/microbench_flrelu.py --impl fused --layers L13 --batch 8; then
  echo "FAILED: canary — skipping all later MXU stages"; exit 2
fi

echo "=== b2: mxu down L10,L11,L12 batch 8 $(date) ==="
timeout 1800 env SG3TPU_FLRELU_DOWN=mxu \
  python scripts/microbench_flrelu.py --impl fused --layers L10,L11,L12 --batch 8 \
  || echo "FAILED: b2"

echo "=== b3: vpu baseline L10-L13 batch 8 $(date) ==="
timeout 1800 python scripts/microbench_flrelu.py --impl fused --layers L10,L11,L12,L13 --batch 8 \
  || echo "FAILED: b3"

echo "=== b4: mxu down mid up=2 layers L1,L3,L6,L8 batch 8 $(date) ==="
timeout 1800 env SG3TPU_FLRELU_DOWN=mxu \
  python scripts/microbench_flrelu.py --impl fused --layers L1,L3,L6,L8 --batch 8 \
  || echo "FAILED: b4"

echo "=== b5: vpu baseline L1,L3,L6,L8 batch 8 $(date) ==="
timeout 1800 python scripts/microbench_flrelu.py --impl fused --layers L1,L3,L6,L8 --batch 8 \
  || echo "FAILED: b5"

echo "ALL DONE $(date)"
