"""DenseNet feature extractors (flax NHWC) for the projected D.

Parity: torchvision `densenet121/169/201` sliced by the reference's
`_make_densenet` (/root/reference/models/styleganxl/feature_networks/
pretrained_builder.py:85-101): layer0 = stem + denseblock1 + transition1
(incl. its pool, /8), then each later stage is AvgPool2d(2) + denseblock +
transition-conv with the transition's pool replaced by Identity
(/16, /32) — and layer3 = AvgPool + denseblock4 + norm5 (/64).
`convert_densenet_state` maps the torchvision state dict onto the module.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm, bn_from_torch, conv_w, put
from ...ops.image import avg_pool2d, max_pool2d

# name → per-block dense-layer counts (growth rate 32, stem 64, bn_size 4).
DENSENET_BLOCKS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}
_GROWTH = 32
_BN_SIZE = 4


def densenet_channels(blocks) -> tuple:
    """4-stage output channels for a block config."""
    c = 64
    outs = []
    for bi, n in enumerate(blocks):
        c += n * _GROWTH
        if bi < 3:
            c //= 2  # transition conv halves
        outs.append(c)
    return tuple(outs)


class DenseLayer(nn.Module):
    """torchvision _DenseLayer: BN-ReLU-Conv1×1(128) → BN-ReLU-Conv3×3(32)."""

    @nn.compact
    def __call__(self, x):
        y = nn.relu(BatchNorm(name="norm1")(x))
        y = nn.Conv(_BN_SIZE * _GROWTH, (1, 1), use_bias=False,
                    name="conv1")(y)
        y = nn.relu(BatchNorm(name="norm2")(y))
        y = nn.Conv(_GROWTH, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetStages(nn.Module):
    """NHWC input → 4 feature maps (/8, /16, /32, /64)."""

    blocks: tuple = DENSENET_BLOCKS["densenet121"]

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv0")(x)
        x = nn.relu(BatchNorm(name="norm0")(x))
        x = max_pool2d(x, 3, 2, padding=1)
        outs = []
        for bi, n in enumerate(self.blocks):
            if bi > 0:
                x = avg_pool2d(x, 2, 2)  # the splitter's leading AvgPool2d
            for li in range(n):
                x = DenseLayer(name=f"block{bi}_layer{li}")(x)
            if bi < 3:
                # Transition: BN-ReLU-Conv1×1 (channels halved). Its pool
                # belongs to layer0 only (later stages: pool → Identity).
                x = nn.relu(BatchNorm(name=f"trans{bi}_norm")(x))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            name=f"trans{bi}_conv")(x)
                if bi == 0:
                    x = avg_pool2d(x, 2, 2)
            else:
                x = BatchNorm(name="norm5")(x)  # no relu (raw features tail)
            outs.append(x)
        return outs


def convert_densenet_state(state: Mapping[str, np.ndarray],
                           blocks=DENSENET_BLOCKS["densenet121"]) -> dict:
    """torchvision densenet state dict → module variables."""
    params: Dict = {}
    stats: Dict = {}
    put(params, "conv0/kernel", conv_w(state["features.conv0.weight"]))
    bn_from_torch(params, stats, "norm0", state, "features.norm0")
    for bi, n in enumerate(blocks):
        for li in range(n):
            src = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            dst = f"block{bi}_layer{li}"
            bn_from_torch(params, stats, f"{dst}/norm1", state, f"{src}.norm1")
            put(params, f"{dst}/conv1/kernel", conv_w(state[f"{src}.conv1.weight"]))
            bn_from_torch(params, stats, f"{dst}/norm2", state, f"{src}.norm2")
            put(params, f"{dst}/conv2/kernel", conv_w(state[f"{src}.conv2.weight"]))
        if bi < 3:
            src = f"features.transition{bi + 1}"
            bn_from_torch(params, stats, f"trans{bi}_norm", state, f"{src}.norm")
            put(params, f"trans{bi}_conv/kernel",
                conv_w(state[f"{src}.conv.weight"]))
        else:
            bn_from_torch(params, stats, "norm5", state, "features.norm5")
    return {"params": params, "batch_stats": stats}


def make_densenet(name: str):
    """'densenet121/169/201' → (module factory, converter, channels)."""
    blocks = DENSENET_BLOCKS[name]

    def make(**kw):
        return DenseNetStages(blocks=blocks, **kw)

    def convert(st):
        return convert_densenet_state(st, blocks)

    return make, convert, densenet_channels(blocks)
