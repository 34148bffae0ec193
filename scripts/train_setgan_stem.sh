#!/bin/bash
# Canonical SetGAN STEM recipe — the published hyperparameters of
# /root/reference/scripts/train_setgan_stem.sh:35-66 mapped onto this CLI:
# stylegan3-t stem, cbase 16384 / cmax 256, syn_layers 7, reference sets
# 4-7, candidate sets 1-4, d_latent 128, 2 G/D attention layers, no
# restyle, no mean centering, global batch 16 (the reference's 4×A40 at
# batch 4/GPU → here one pjit program over the device mesh).
#
# Usage: train_setgan_stem.sh RES DATA_ROOT EXP_NAME [resume_ckpt] [kimg]
#   RES        training resolution (reference runs 16/32/64 stems)
#   DATA_ROOT  class-per-subfolder image root (or named dataset via
#              SG3TPU_DATASET=celeba|vggface|animalfaces|flowers|...)
#   EXP_NAME   experiment name (outputs under ./training-runs/)
#
# SG3TPU_SMOKE=1 shrinks everything to a one-step CPU-mesh smoke run (CI).
set -eu
cd "$(dirname "$0")/.."

RES=${1:?usage: train_setgan_stem.sh RES DATA_ROOT EXP_NAME [ckpt] [kimg]}
DATA=${2:?missing DATA_ROOT}
EXP=${3:?missing EXP_NAME}
CKPT=${4:-}
KIMG=${5:-10000}

ARGS=(
  --outdir "${OUTDIR:-./training-runs}/${EXP}_${RES}"
  --data "$DATA"
  --resolution "$RES"
  --total_kimg "$KIMG"
  --batch 16
  --cbase 16384 --cmax 256 --syn_layers 7
  --reference_min 4 --reference_max 7
  --candidate_min 1 --candidate_max 4
  --d_latent 128
  --g_attn_layers 2 --d_attn_layers 2
  --restyle_mode none --restyle_iters 1
  --no_mean_center true
  --data_augmentation true        # reference --mirror=1
  --d_remat_features true         # frozen D-trunk remat
  --g_remat_encoder true          # encoder-trunk remat: the measured HBM
                                  # floor at batch 4/chip (round-5g)
  --snapshot_ticks 10
  --encoder_res "$RES"            # reference --encoder_res -1 (train res)
)
[ -n "${SG3TPU_DATASET:-}" ] && ARGS+=(--dataset "$SG3TPU_DATASET")
[ -n "$CKPT" ] && ARGS+=(--resume "$CKPT")

if [ "${SG3TPU_SMOKE:-0}" = 1 ]; then
  # CI smoke: one train step on the (virtual) CPU mesh, tiny nets, no FID.
  export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
  export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=2}"
  ARGS+=(--total_kimg 0.004 --batch 2 --cbase 1024 --cmax 64
         --syn_layers 4 --reference_min 2 --reference_max 3
         --candidate_min 1 --candidate_max 2 --fid false
         --backbones tiny_proj --encoder_num_layers 8 --devices 2 --tick_kimg 0.002)
fi

exec python scripts/train_setgan.py "${ARGS[@]}"
