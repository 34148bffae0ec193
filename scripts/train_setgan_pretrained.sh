#!/bin/bash
# Canonical SetGAN PRETRAINED recipe — the published hyperparameters of
# /root/reference/scripts/train_setgan_pretrained.sh:30-75 mapped onto this
# CLI: set-attention-only training over a pretrained ReStyle encoder and
# decoder (both frozen), ProgressiveBackboneEncoder, restyle_mode=encoder,
# reference sets 4-7, candidates 1-4.
#
# Usage: train_setgan_pretrained.sh RES DATA_ROOT EXP_NAME ENCODER_CKPT \
#          [GENERATOR_CKPT] [resume_ckpt] [kimg]
#   ENCODER_CKPT    released ReStyle encoder .pt or a coach checkpoint
#   GENERATOR_CKPT  pretrained decoder stem (.pt/.npz; optional)
#
# SG3TPU_SMOKE=1 shrinks to a one-step CPU-mesh smoke run (CI); pass '-'
# for ENCODER_CKPT to train with a randomly initialized (still frozen)
# encoder in smoke mode.
set -eu
cd "$(dirname "$0")/.."

RES=${1:?usage: train_setgan_pretrained.sh RES DATA_ROOT EXP_NAME ENCODER_CKPT [GEN_CKPT] [ckpt] [kimg]}
DATA=${2:?missing DATA_ROOT}
EXP=${3:?missing EXP_NAME}
ENC=${4:?missing ENCODER_CKPT}
GEN=${5:-}
CKPT=${6:-}
KIMG=${7:-10000}

ARGS=(
  --outdir "${OUTDIR:-./training-runs}/${EXP}_${RES}"
  --data "$DATA"
  --resolution "$RES"
  --total_kimg "$KIMG"
  --batch 16
  --cbase 16384 --cmax 256 --syn_layers 7
  --encoder_type ProgressiveBackboneEncoder
  --reference_min 4 --reference_max 7
  --candidate_min 1 --candidate_max 4
  --d_latent 128
  --g_attn_layers 2 --d_attn_layers 2
  --restyle_mode encoder --restyle_iters 1
  --freeze_encoder true --freeze_decoder true
  --use_set_decoder true
  --data_augmentation true        # reference --mirror=1
  --snapshot_ticks 10
)
[ "$ENC" != - ] && ARGS+=(--encoder_path "$ENC")
[ -n "$GEN" ] && [ "$GEN" != - ] && ARGS+=(--generator_path "$GEN")
[ -n "${SG3TPU_DATASET:-}" ] && ARGS+=(--dataset "$SG3TPU_DATASET")
[ -n "$CKPT" ] && ARGS+=(--resume "$CKPT")

if [ "${SG3TPU_SMOKE:-0}" = 1 ]; then
  export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
  export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=2}"
  ARGS+=(--total_kimg 0.004 --batch 2 --cbase 1024 --cmax 64
         --syn_layers 4 --reference_min 2 --reference_max 3
         --candidate_min 1 --candidate_max 2 --fid false
         --backbones tiny_proj --encoder_num_layers 8 --devices 2 --tick_kimg 0.002
         --encoder_res 64)
fi

exec python scripts/train_setgan.py "${ARGS[@]}"
