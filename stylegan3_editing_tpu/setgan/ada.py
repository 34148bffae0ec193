"""Adaptive discriminator augmentation (ADA) heuristic.

Parity: reference setgan/training_loop.py:482-486 — adjust augmentation
probability `p` so that the sign of real-logit scores tracks `ada_target`
(0.6): p += sign(E[sign(real_logits)] − target) · (batch · interval) /
(ada_kimg · 1000), clipped to [0, 1]. The augmentation itself applies
DiffAugment with probability p per sample (the reference's full ADA pipe's
geometric ops ride on `grid_sample`, available in ops/image.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .diffaugment import diff_augment


@dataclasses.dataclass
class AdaState:
    p: float = 0.0
    sign_sum: float = 0.0
    count: int = 0


class AdaController:
    """Host-side p adaptation from accumulated real-logit signs."""

    def __init__(self, target: float = 0.6, interval_imgs: int = 4 * 64,
                 ada_kimg: float = 500.0):
        self.target = target
        self.interval_imgs = interval_imgs
        self.ada_kimg = ada_kimg
        self.state = AdaState()

    def update(self, real_logit_signs: float, batch_size: int) -> float:
        """Feed E[sign(real_logits)] for one step; returns current p."""
        s = self.state
        s.sign_sum += float(real_logit_signs) * batch_size
        s.count += batch_size
        if s.count >= self.interval_imgs:
            mean_sign = s.sign_sum / max(s.count, 1)
            adjust = np.sign(mean_sign - self.target) * (
                s.count / (self.ada_kimg * 1000))
            s.p = float(np.clip(s.p + adjust, 0.0, 1.0))
            s.sign_sum = 0.0
            s.count = 0
        return s.p


def apply_ada(key: jax.Array, images: jax.Array, p: float,
              policy: str = "color,translation,cutout") -> jax.Array:
    """Apply DiffAugment to each image with probability p (batched mask)."""
    if p <= 0:
        return images
    k_aug, k_mask = jax.random.split(key)
    augmented = diff_augment(k_aug, images, policy)
    mask = jax.random.uniform(k_mask, (images.shape[0], 1, 1, 1)) < p
    return jnp.where(mask, augmented, images)
