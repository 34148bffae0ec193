"""MoCo-v2 feature similarity loss for non-face domains (flax, NHWC).

Semantics parity: reference criteria/moco_loss.py — nearest-resize to 224,
frozen MoCo ResNet-50 features, unit-normalize, loss = mean(1 − ⟨ŷ, y⟩),
plus the similarity-improvement statistic. Converter: strip the
`module.encoder_q.` prefix from a MoCo checkpoint and feed
`models.backbones.resnet.convert_resnet50_state`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.backbones.resnet import ResNet50Features
from ..ops.image import resize_nearest


class MocoLoss(nn.Module):
    """forward(y_hat, y, x) → (loss, sim_improvement, logs)."""

    def setup(self):
        self.model = ResNet50Features()

    def extract_feats(self, x: jax.Array) -> jax.Array:
        x = resize_nearest(x, 224)
        feats = self.model(x)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, y_hat: jax.Array, y: jax.Array, x: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, dict]:
        x_feats = self.extract_feats(x)
        y_feats = jax.lax.stop_gradient(self.extract_feats(y))
        y_hat_feats = self.extract_feats(y_hat)

        diff_target = jnp.sum(y_hat_feats * y_feats, axis=-1)
        diff_input = jnp.sum(y_hat_feats * x_feats, axis=-1)
        diff_views = jnp.sum(y_feats * x_feats, axis=-1)

        loss = jnp.mean(1 - diff_target)
        sim_improvement = jnp.mean(diff_target - diff_views)
        logs = {"diff_target": diff_target, "diff_input": diff_input,
                "diff_views": diff_views}
        return loss, sim_improvement, logs
