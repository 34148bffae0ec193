"""Core trainable layers of the alias-free generator (flax.linen, NHWC).

Parity targets: `FullyConnectedLayer`
(/root/reference/models/stylegan3/networks_stylegan3.py:68-103) and
`MappingNetwork` (:108-163). Mutable torch buffers (`w_avg`) become flax
variables in the 'ema' collection, updated functionally when the caller
passes ``update_emas=True`` with ``mutable=['ema']``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.bias_act import bias_act


class FullyConnected(nn.Module):
    """Equalized-LR fully connected layer.

    Weight stored ``[out_features, in_features]`` (reference layout, so the
    checkpoint converter is a 1:1 name map); runtime gain
    ``lr_multiplier / sqrt(in_features)``.
    """

    out_features: int
    activation: str = "linear"
    use_bias: bool = True
    lr_multiplier: float = 1.0
    weight_init: float = 1.0
    bias_init: Union[float, Sequence[float]] = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        weight = self.param(
            "weight",
            lambda key: jax.random.normal(key, (self.out_features, in_features),
                                          jnp.float32)
            * (self.weight_init / self.lr_multiplier),
        )
        weight_gain = self.lr_multiplier / np.sqrt(in_features)
        w = (weight * weight_gain).astype(x.dtype)
        y = x @ w.T

        b = None
        if self.use_bias:
            bias0 = np.broadcast_to(
                np.asarray(self.bias_init, np.float32), (self.out_features,))
            bias = self.param("bias", lambda key: jnp.asarray(bias0 / self.lr_multiplier))
            b = (bias * self.lr_multiplier).astype(x.dtype)

        return bias_act(y, b, dim=-1, act=self.activation)


class MappingNetwork(nn.Module):
    """z (+ class embedding) → broadcast W+ latents with truncation.

    `w_avg` lives in the 'ema' collection; pass ``update_emas=True`` under
    ``mutable=['ema']`` during training to track the W moving average.
    """

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: int
    num_layers: int = 2
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        c: Optional[jax.Array] = None,
        truncation_psi: Union[float, jax.Array] = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_emas: bool = False,
    ) -> jax.Array:
        assert z.shape[-1] == self.z_dim
        if truncation_cutoff is None:
            truncation_cutoff = self.num_ws

        x = z.astype(jnp.float32)
        x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + 1e-8)
        if self.c_dim > 0:
            assert c is not None and c.shape[-1] == self.c_dim
            y = FullyConnected(self.w_dim, name="embed")(c.astype(jnp.float32))
            y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y), axis=1, keepdims=True) + 1e-8)
            x = jnp.concatenate([x, y], axis=1)

        for idx in range(self.num_layers):
            x = FullyConnected(
                self.w_dim,
                activation="lrelu",
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )(x)

        w_avg = self.variable("ema", "w_avg",
                              lambda: jnp.zeros((self.w_dim,), jnp.float32))
        if update_emas and not self.is_initializing():
            batch_mean = jax.lax.stop_gradient(jnp.mean(x, axis=0))
            w_avg.value = batch_mean + self.w_avg_beta * (w_avg.value - batch_mean)

        ws = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        static_psi = isinstance(truncation_psi, (int, float))
        if not (static_psi and truncation_psi == 1):
            psi = jnp.asarray(truncation_psi, jnp.float32)
            truncated = w_avg.value + psi * (ws[:, :truncation_cutoff] - w_avg.value)
            ws = jnp.concatenate([truncated, ws[:, truncation_cutoff:]], axis=1)
        return ws
