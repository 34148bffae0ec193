#!/bin/bash
# Canonical SetGAN SUPERRES recipe — the published hyperparameters of
# /root/reference/scripts/train_setgan_superres.sh:30-65 mapped onto this
# CLI: grow a trained stem ×2 with 4 new head layers (7 on imagenet) and
# train ONLY the head (stem + mapping frozen), reference sets 1-2,
# candidates 1-2, encoder_res 256.
#
# Usage: train_setgan_superres.sh RES DATA_ROOT EXP_NAME PATH_STEM [ckpt] [kimg]
#   RES        target resolution (stem resolution × 2)
#   PATH_STEM  stem snapshot (.npz from a train_setgan_stem.sh run)
#
# SG3TPU_SMOKE=1 shrinks to a one-step CPU-mesh smoke run (CI); if
# PATH_STEM is '-' in smoke mode, a one-step stem is trained first.
set -eu
cd "$(dirname "$0")/.."

RES=${1:?usage: train_setgan_superres.sh RES DATA_ROOT EXP_NAME PATH_STEM [ckpt] [kimg]}
DATA=${2:?missing DATA_ROOT}
EXP=${3:?missing EXP_NAME}
STEM=${4:?missing PATH_STEM (stem snapshot .npz)}
CKPT=${5:-}
KIMG=${6:-10000}

if [ "${SG3TPU_SMOKE:-0}" = 1 ] && [ "$STEM" = - ]; then
  SG3TPU_SMOKE=1 bash scripts/train_setgan_stem.sh $((RES / 2)) "$DATA" "${EXP}_stem"
  STEM="${OUTDIR:-./training-runs}/${EXP}_stem_$((RES / 2))/final"
fi

ARGS=(
  --outdir "${OUTDIR:-./training-runs}/${EXP}_${RES}"
  --data "$DATA"
  --resolution "$RES"
  --total_kimg "$KIMG"
  --batch 16
  --cbase 16384 --cmax 256 --syn_layers 7
  --superres true --up_factor 2 --head_layers 4
  --path_stem "$STEM"
  --reference_min 1 --reference_max 2
  --candidate_min 1 --candidate_max 2
  --d_latent 128
  --g_attn_layers 2 --d_attn_layers 2
  --restyle_mode none --restyle_iters 1
  --encoder_res 256
  --data_augmentation true        # reference --mirror=1
  --snapshot_ticks 10
)
[ -n "${SG3TPU_DATASET:-}" ] && ARGS+=(--dataset "$SG3TPU_DATASET")
[ -n "$CKPT" ] && ARGS+=(--resume "$CKPT")

if [ "${SG3TPU_SMOKE:-0}" = 1 ]; then
  export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
  export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=2}"
  ARGS+=(--total_kimg 0.004 --batch 2 --cbase 1024 --cmax 64
         --syn_layers 4 --head_layers 2 --fid false
         --backbones tiny_proj --encoder_num_layers 8 --devices 2 --tick_kimg 0.002
         --encoder_res "$RES")
fi

exec python scripts/train_setgan.py "${ARGS[@]}"
