#!/bin/bash
# Canonical ReStyle-e4e encoder recipe — the published hyperparameters of
# /root/reference/train.sh:15-37 mapped onto this CLI:
# ResNetProgressiveBackboneEncoder, batch 2, LPIPS 0.8 / L2 1.0 / ID 0.1 /
# w-disc 0.1, W-pool, 6-channel input, 3 ReStyle iterations, psi 0.7,
# output 256, 18 styles, save every 2000 steps.
#
# Usage: train_e4e.sh NAME STYLEGAN_WEIGHTS DATA_ROOT [resume_ckpt]
#
# SG3TPU_SMOKE=1 shrinks to a one-step CPU smoke run (CI); pass '-' for
# STYLEGAN_WEIGHTS to train against a randomly initialized decoder.
set -eu
cd "$(dirname "$0")/.."

NAME=${1:?usage: train_e4e.sh NAME STYLEGAN_WEIGHTS DATA_ROOT [ckpt]}
WEIGHTS=${2:?missing STYLEGAN_WEIGHTS}
DATA=${3:?missing DATA_ROOT}
CKPT=${4:-}

ARGS=(
  --exp_dir "experiments/$NAME"
  --encoder_type ResNetProgressiveBackboneEncoder
  --train_root "$DATA"
  --batch_size 2 --test_batch_size 2
  --start_from_latent_avg true
  --lpips_lambda 0.8 --l2_lambda 1 --id_lambda 0.1
  --w_discriminator_lambda 0.1 --use_w_pool true
  --input_nc 6 --n_iters_per_batch 3
  --truncation_psi 0.7
  --output_size 256
  --save_interval 2000
  --n_styles 18
)
[ "$WEIGHTS" != - ] && ARGS+=(--stylegan_weights "$WEIGHTS")
[ -n "$CKPT" ] && ARGS+=(--resume_training_from_ckpt "$CKPT")

if [ "${SG3TPU_SMOKE:-0}" = 1 ]; then
  export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
  ARGS+=(--output_size 64 --decoder_channel_base 1024
         --decoder_channel_max 64 --decoder_num_layers 4
         --n_styles 7 --max_steps 1 --n_iters_per_batch 2
         --lpips_lambda 0 --id_lambda 0  # pretrained-net losses off in CI
         --val_interval 10 --max_val_batches 1 --image_interval 1000000)
fi

exec python scripts/train_restyle_e4e.py "${ARGS[@]}"
