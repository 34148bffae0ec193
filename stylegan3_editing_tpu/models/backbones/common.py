"""Shared building blocks + torch-weight mapping helpers for backbones."""

from __future__ import annotations

from typing import Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch PReLU(num_parameters=C))."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key: jnp.full((x.shape[-1],), 0.25, jnp.float32))
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, x * a)


class BatchNorm(nn.Module):
    """Inference/training batch norm with torch-compatible parameters.

    'params': scale/bias (if affine); 'batch_stats': mean/var. Uses torch's
    momentum convention (new = (1-momentum)*old + momentum*batch).
    """

    use_running_average: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        if train and not self.is_initializing():
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            batch_mean = jnp.mean(x32, axis=axes)
            batch_var = jnp.var(x32, axis=axes)
            n = np.prod([x.shape[a] for a in axes])
            unbiased = batch_var * (n / max(n - 1, 1))
            mean.value = (1 - self.momentum) * mean.value + self.momentum * batch_mean
            var.value = (1 - self.momentum) * var.value + self.momentum * unbiased
            use_mean, use_var = batch_mean, batch_var
        else:
            use_mean, use_var = mean.value, var.value

        y = (x - use_mean.astype(x.dtype)) * jax.lax.rsqrt(
            use_var + self.epsilon).astype(x.dtype)
        if self.affine:
            scale = self.param("scale", lambda key: jnp.ones((c,), jnp.float32))
            bias = self.param("bias", lambda key: jnp.zeros((c,), jnp.float32))
            y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y


def conv_w(t: np.ndarray) -> jnp.ndarray:
    """torch conv weight OIHW → flax HWIO."""
    return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))


def dense_w(t: np.ndarray) -> jnp.ndarray:
    """torch linear weight [out, in] → flax Dense kernel [in, out]."""
    return jnp.asarray(np.asarray(t).T)


def put(tree: Dict, dotted: str, value):
    node = tree
    keys = dotted.split("/")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = jnp.asarray(value)


def bn_from_torch(params: Dict, stats: Dict, prefix_out: str,
                  state: Mapping[str, np.ndarray], prefix_in: str,
                  affine: bool = True):
    """Copy one torch BatchNorm's 4 tensors into our two collections."""
    if affine:
        put(params, f"{prefix_out}/scale", state[f"{prefix_in}.weight"])
        put(params, f"{prefix_out}/bias", state[f"{prefix_in}.bias"])
    put(stats, f"{prefix_out}/mean", state[f"{prefix_in}.running_mean"])
    put(stats, f"{prefix_out}/var", state[f"{prefix_in}.running_var"])
