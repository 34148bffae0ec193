"""CLIP similarity loss for StyleCLIP mapper training.

Parity: reference criteria/clip_loss.py — pool the generator output to 224²
(upsample ×7 then avg-pool size/32 ≡ area-resize to 224) and score
`1 − logits_per_image / 100` against tokenized text.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.backbones.clip import CLIP, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
from ..ops.image import avg_pool2d, resize_nearest


class CLIPLoss(nn.Module):
    """forward(image NHWC [-1,1], text token ids [M,77]) → [N, M] loss."""

    stylegan_size: int = 1024

    def setup(self):
        self.model = CLIP()

    def __call__(self, image: jax.Array, text: jax.Array) -> jax.Array:
        # upsample ×7 (nearest) then avg-pool k=size/32 → 224² (reference
        # pooling pipeline), then CLIP normalization from [-1, 1].
        k = self.stylegan_size // 32
        x = resize_nearest(image, image.shape[1] * 7)
        x = avg_pool2d(x, k)
        x = (x + 1) / 2
        x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        logits_per_image, _ = self.model(x, text)
        return 1 - logits_per_image / 100
