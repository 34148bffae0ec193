"""ProjectedSetGANLoss: hinge D / −mean G over multi-scale set logits.

Parity: reference setgan/loss.py — G loss = Σ −mean(logits) (:127),
D loss = Σ relu(1 + fake) + Σ relu(1 − real) (:171, :186), discriminator
blur schedule (:86-102, :112), path-length regularization starting at 1M
images with pl_batch_shrink=2, pl_decay=0.01 (:145-162).

TPU notes: blur is a separable depthwise conv; pl lengths come from one
`jax.vjp` pull-back onto the style latents (the reference's
`no_weight_gradients` is a CUDA memory trick — XLA's remat handles it);
`pl_mean` is functional state threaded through the step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn2d import upfirdn2d
from .model import to_images, to_set


@dataclasses.dataclass(frozen=True)
class SetGANLossConfig:
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    pl_weight: float = 0.0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    pl_start_nimg: float = 1e6


def blur_sigma_at(cur_nimg, cfg: SetGANLossConfig):
    if cfg.blur_fade_kimg <= 1:
        return 0.0
    return max(1 - cur_nimg / (cfg.blur_fade_kimg * 1e3), 0) * cfg.blur_init_sigma


def blur_images(imgs: jax.Array, blur_sigma: float) -> jax.Array:
    """Gaussian blur over set images (static sigma per compilation)."""
    blur_size = int(np.floor(blur_sigma * 3))
    if blur_size <= 0:
        return imgs
    taps = np.arange(-blur_size, blur_size + 1) / blur_sigma
    f = np.exp2(-np.square(taps)).astype(np.float32)
    f = f / f.sum()
    b = imgs.shape[0]
    flat = to_images(imgs)
    pad = blur_size
    blurred = upfirdn2d(flat, f, padding=pad)
    return to_set(blurred, b)


def g_main_loss(logits: jax.Array) -> jax.Array:
    """Generator: maximize logits → −mean per scale, summed."""
    return jnp.sum(-jnp.mean(logits, axis=0))


def d_main_loss(real_logits: jax.Array, fake_logits: jax.Array
                ) -> Tuple[jax.Array, dict]:
    """Hinge discriminator loss over concatenated multi-scale logits."""
    loss_fake = jnp.sum(jnp.mean(jax.nn.relu(1 + fake_logits), axis=0))
    loss_real = jnp.sum(jnp.mean(jax.nn.relu(1 - real_logits), axis=0))
    stats = {
        "Loss/scores/fake": jnp.mean(fake_logits),
        "Loss/scores/real": jnp.mean(real_logits),
        "Loss/signs/fake": jnp.mean(jnp.sign(fake_logits)),
        "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
        "Loss/D/loss": loss_fake + loss_real,
    }
    return loss_fake + loss_real, stats


def path_length_penalty(
    run_g_from_ws,  # ws -> images ([N, C, H, W, 3] set or image batch)
    ws: jax.Array,
    pl_mean: jax.Array,
    rng: jax.Array,
    cfg: SetGANLossConfig,
) -> Tuple[jax.Array, jax.Array, dict]:
    """StyleGAN2 path-length regularization.

    Returns (penalty_mean, new_pl_mean, stats). `ws`: [N, n_styles, w_dim].
    """
    imgs, vjp_fn = jax.vjp(run_g_from_ws, ws)
    h, w = imgs.shape[-3], imgs.shape[-2]
    noise = jax.random.normal(rng, imgs.shape) / np.sqrt(h * w)
    (pl_grads,) = vjp_fn(noise)
    pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=-1),
                                   axis=-1))
    pl_lengths = pl_lengths.reshape(-1)
    new_pl_mean = pl_mean + cfg.pl_decay * (
        jnp.mean(pl_lengths) - pl_mean)
    penalty = jnp.square(pl_lengths - new_pl_mean)
    stats = {"Loss/pl_penalty": jnp.mean(penalty)}
    return jnp.mean(penalty) * cfg.pl_weight, jax.lax.stop_gradient(new_pl_mean), stats
