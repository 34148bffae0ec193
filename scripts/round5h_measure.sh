#!/bin/bash
# Round-5h on-chip measurement plan (run SERIALLY on an idle host — this box
# has one CPU core; concurrent CPU work starves the tunnel client and
# pollutes timings up to 3x, see ROUND5.md measurement-discipline note).
#
# Stages:
#  1. bench.py with the geometry-aware auto engines (confirm 8.61 img/s)
#  2. SetGAN stem step with encoder-trunk remat: batch 2 and the canonical
#     batch 4 (VERDICT r4 #4 — target < 44 s/kimg)
#  3. Video split-program fps at frame-batch 2/4/8 with --bf16-decode
#     (VERDICT r4 #5 — target >= 1.0 fps), plus fb2 fp32 for the protocol
#     number
# Each stage appends to /tmp/round5h.log; markers go to stderr.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round5h.log
: > "$LOG"

run_stage() {
  local name=$1; shift
  echo "=== $name ===" >> "$LOG"
  if ! timeout 2400 "$@" >> "$LOG" 2>&1; then
    echo "FAILED/TIMEOUT: $name" >&2
  fi
  echo >> "$LOG"
}

run_stage bench_default python bench.py
run_stage setgan_b2_remat python scripts/bench_train_steps.py --what setgan \
  --batch 2 --d_remat_features --g_remat_encoder
run_stage setgan_b4_remat python scripts/bench_train_steps.py --what setgan \
  --batch 4 --d_remat_features --g_remat_encoder
run_stage video_fb2_bf16 python scripts/bench_video.py --batch 2 --split --bf16-decode
run_stage video_fb4_bf16 python scripts/bench_video.py --batch 4 --split --bf16-decode
run_stage video_fb8_bf16 python scripts/bench_video.py --batch 8 --split --bf16-decode
run_stage video_fb2_fp32 python scripts/bench_video.py --batch 2 --split
echo "round5h done; results in $LOG" >&2
