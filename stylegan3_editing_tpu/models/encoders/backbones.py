"""ReStyle encoder trunks: IR-SE-50 and ResNet-34 variants, plain and
progressive (e4e).

Parity: reference restyle_psp_encoders.py (BackboneEncoder :10-50,
ResNetBackboneEncoder :53-93) and restyle_e4e_encoders.py
(ProgressiveBackboneEncoder :31-88, ResNetProgressiveBackboneEncoder
:91-148). All styles are read off the final 16×16/512-ch feature map by
`n_styles` GradualStyleBlocks; progressive variants emit w0 + per-stage
deltas. The progressive stage is a static argument (retrace per stage), not
mutable module state.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.common import BatchNorm, PReLU
from ..backbones.irse import BottleneckIR, get_blocks
from ..backbones.resnet import ResNet34Body
from .map2style import GradualStyleBlock

# e4e progressive training schedule (restyle_e4e_encoders.ProgressiveStage):
# stage k trains w0 + deltas 1..k; INFERENCE_STAGE applies all deltas.
INFERENCE_STAGE = -1


class _IRSETrunk(nn.Module):
    """Input layer + IR(-SE) body → 16×16×512 feature map."""

    num_layers: int = 50
    mode: str = "ir_se"

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_se = self.mode == "ir_se"
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="input_conv")(x)
        x = BatchNorm(name="input_bn")(x, train=train)
        x = PReLU(name="input_prelu")(x)
        idx = 0
        for stage in get_blocks(self.num_layers):
            for spec in stage:
                x = BottleneckIR(spec, use_se, name=f"body_{idx}")(x, train=train)
                idx += 1
        return x


class _ResNetTrunk(nn.Module):
    """7×7 stem (no maxpool) + resnet34 body → 16×16×512 feature map."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train=train)
        x = PReLU(name="relu")(x)
        return ResNet34Body(name="body")(x, train=train)


def _read_styles(x, n_styles: int, style_dim: int = 512):
    latents = [GradualStyleBlock(style_dim, 16, name=f"style_{j}")(x)
               for j in range(n_styles)]
    return jnp.stack(latents, axis=1)  # [N, n_styles, style_dim]


def _progressive_styles(x, n_styles: int, stage: int, style_dim: int = 512):
    w0 = GradualStyleBlock(style_dim, 16, name="style_0")(x)
    w = jnp.repeat(w0[:, None, :], n_styles, axis=1)
    limit = n_styles if stage == INFERENCE_STAGE else min(stage + 1, n_styles)
    deltas = []
    for i in range(1, n_styles):
        # Materialize every head's params regardless of stage so the param
        # tree is stage-independent; mask unused deltas to zero.
        delta = GradualStyleBlock(style_dim, 16, name=f"style_{i}")(x)
        deltas.append(delta if i < limit else jnp.zeros_like(delta))
    if deltas:
        w = w.at[:, 1:].add(jnp.stack(deltas, axis=1))
    return w


class BackboneEncoder(nn.Module):
    """ReStyle-pSp encoder, IR-SE-50 trunk. Input NHWC (3 or 6 channels)."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 16
    style_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = _IRSETrunk(self.num_layers, self.mode, name="trunk")(x, train=train)
        return _read_styles(feat, self.n_styles, self.style_dim)


class ResNetBackboneEncoder(nn.Module):
    """ReStyle-pSp encoder, ResNet-34 trunk."""

    n_styles: int = 16
    style_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = _ResNetTrunk(name="trunk")(x, train=train)
        return _read_styles(feat, self.n_styles, self.style_dim)


class ProgressiveBackboneEncoder(nn.Module):
    """ReStyle-e4e encoder, IR-SE-50 trunk, w0 + progressive deltas."""

    num_layers: int = 50
    mode: str = "ir_se"
    n_styles: int = 16
    style_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False, stage: int = INFERENCE_STAGE):
        feat = _IRSETrunk(self.num_layers, self.mode, name="trunk")(x, train=train)
        return _progressive_styles(feat, self.n_styles, stage, self.style_dim)


class ResNetProgressiveBackboneEncoder(nn.Module):
    """ReStyle-e4e encoder, ResNet-34 trunk, w0 + progressive deltas."""

    n_styles: int = 16
    style_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False, stage: int = INFERENCE_STAGE):
        feat = _ResNetTrunk(name="trunk")(x, train=train)
        return _progressive_styles(feat, self.n_styles, stage, self.style_dim)
