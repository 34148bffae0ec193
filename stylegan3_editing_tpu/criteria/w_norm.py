"""W-norm latent regularizer.

Parity: reference criteria/w_norm.py:11-14 — mean over batch of the L2 norm
of (latent − latent_avg) taken over the (num_ws, w_dim) axes jointly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def w_norm_loss(latent: jax.Array, latent_avg: Optional[jax.Array] = None,
                start_from_latent_avg: bool = True) -> jax.Array:
    """latent: [N, num_ws, w_dim]; latent_avg: broadcastable (e.g. [w_dim])."""
    if start_from_latent_avg:
        assert latent_avg is not None
        latent = latent - latent_avg
    norms = jnp.sqrt(jnp.sum(jnp.square(latent), axis=(1, 2)))
    return jnp.sum(norms) / latent.shape[0]
