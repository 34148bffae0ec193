"""Latent-space discriminator + replay pool for e4e training.

Parity: reference e4e_modules/discriminator.py (MLP over single w vectors)
and e4e_modules/latent_codes_pool.py (50%-replacement replay buffer). The
pool is host-side numpy state between jitted steps — exactly the role it
plays in the reference loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import numpy as np


class LatentCodesDiscriminator(nn.Module):
    """MLP on w vectors [N, style_dim] → logits [N, 1]."""

    style_dim: int = 512
    n_mlp: int = 4

    @nn.compact
    def __call__(self, w: jax.Array) -> jax.Array:
        x = w
        for i in range(self.n_mlp - 1):
            x = nn.Dense(self.style_dim, name=f"fc{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, name="out")(x)


class LatentCodesPool:
    """Replay buffer of w codes (host-side, numpy).

    query(ws): per sample — if the pool isn't full, store and return the
    input; else with p=0.5 swap with a random stored code. 3-D inputs
    ([N, num_ws, 512]) contribute one random row each.
    """

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.ws = []
        self.rng = np.random.RandomState(seed)

    def query(self, ws: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return ws
        out = []
        for w in np.asarray(ws):
            if w.ndim == 2:  # [num_ws, 512] → random row
                w = w[self.rng.randint(0, w.shape[0])]
            out.append(self._handle(w))
        return np.stack(out, axis=0)

    def _handle(self, w: np.ndarray) -> np.ndarray:
        if len(self.ws) < self.pool_size:
            self.ws.append(w)
            return w
        if self.rng.uniform() > 0.5:
            idx = self.rng.randint(0, self.pool_size)
            old = self.ws[idx].copy()
            self.ws[idx] = w
            return old
        return w
