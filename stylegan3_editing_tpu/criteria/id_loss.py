"""Identity loss via an IR-SE-50 face embedding (flax, NHWC).

Semantics parity: reference criteria/id_loss.py — adaptive-pool to 256², crop
rows 35:223 / cols 32:220, adaptive-pool to 112², embed, loss = mean(1 −
⟨ŷ, y⟩) with stop-gradient targets; also reports the similarity improvement
of ŷ over the source x. The per-sample loop is vectorized.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.backbones.irse import IRSEBackbone
from ..ops.image import adaptive_avg_pool2d


class IDLoss(nn.Module):
    """forward(y_hat, y, x) → (loss, sim_improvement, logs)."""

    def setup(self):
        self.facenet = IRSEBackbone(input_size=112, num_layers=50,
                                    mode="ir_se", drop_ratio=0.6)

    def extract_feats(self, x: jax.Array) -> jax.Array:
        if x.shape[1] != 256:
            x = adaptive_avg_pool2d(x, 256)
        x = x[:, 35:223, 32:220, :]
        x = adaptive_avg_pool2d(x, 112)
        return self.facenet(x)

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
