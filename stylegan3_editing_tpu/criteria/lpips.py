"""LPIPS perceptual distance (flax, NHWC, jit-friendly).

Semantics parity: reference criteria/lpips/lpips.py — z-scored input (shift
(-.030,-.088,-.188), scale (.458,.448,.450)), unit-normalized features at the
standard taps, squared diffs, fixed 1×1 linear heads, spatial mean, sum over
layers and batch / batch. Weight converter accepts the richzhang linear-head
state dicts (`{i}.1.weight` naming after the reference's key rewrite).
"""

from __future__ import annotations

from typing import List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones.alexnet import AlexNetFeatures, N_CHANNELS as ALEX_CH
from ..models.backbones.squeezenet import SqueezeNetFeatures, N_CHANNELS as SQUEEZE_CH
from ..models.backbones.vgg import VGG16Features, N_CHANNELS as VGG_CH
from ..models.backbones.common import put

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _normalize_activation(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """LPIPS criterion. Input: NHWC images in [-1, 1]. Returns scalar."""

    net_type: str = "alex"  # 'alex' | 'vgg' | 'squeeze'

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        if self.net_type == "alex":
            net = AlexNetFeatures(name="net")
            channels = ALEX_CH
        elif self.net_type == "vgg":
            net = VGG16Features(name="net")
            channels = VGG_CH
        elif self.net_type == "squeeze":
            net = SqueezeNetFeatures(name="net")
            channels = SQUEEZE_CH
        else:
            raise NotImplementedError(self.net_type)

        def z_score(img):
            return (img - _SHIFT) / _SCALE

        feat_x = net(z_score(x))
        feat_y = net(z_score(y))

        total = jnp.zeros((), jnp.float32)
        for i, (fx, fy) in enumerate(zip(feat_x, feat_y)):
            d = jnp.square(_normalize_activation(fx) - _normalize_activation(fy))
            # Init = uniform channel average: keeps untrained LPIPS a valid
            # non-negative distance (released heads are non-negative and
            # replace this via `convert_lpips_linear_state`).
            lin = self.param(
                f"lin{i}",
                lambda key, c=channels[i]: jnp.full((1, 1, c, 1), 1.0 / c))
            # 1×1 conv == channel-weighted sum; then spatial mean, batch sum.
            score = jnp.einsum("nhwc,c->nhw", d, lin[0, 0, :, 0])
            total = total + jnp.sum(jnp.mean(score, axis=(1, 2)))
        return total / x.shape[0]


def convert_lpips_linear_state(state: Mapping[str, np.ndarray]) -> dict:
    """richzhang linear heads (`{i}.1.weight`, [1, C, 1, 1]) → params.

    Handles any head count (5 for alex/vgg, 7 for squeeze)."""
    params: dict = {}
    n_heads = sum(1 for k in state if k.endswith(".1.weight"))
    for i in range(n_heads):
        w = np.asarray(state[f"{i}.1.weight"])  # [1, C, 1, 1]
        put(params, f"lin{i}", w.transpose(2, 3, 1, 0))  # → [1, 1, C, 1]
    return params
