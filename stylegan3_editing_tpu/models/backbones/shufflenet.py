"""ShuffleNetV2-x0.5 feature extractor (flax NHWC) for the projected D.

Parity: torchvision `shufflenet_v2_x0_5` sliced by the reference's
`_make_shufflenet` (/root/reference/models/styleganxl/feature_networks/
pretrained_builder.py:103-109): layer0 = conv1 + maxpool (/4 24ch),
layer1-3 = stage2/3/4 (48/96/192 at /8 /16 /32).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm, bn_from_torch, conv_w, put
from ...ops.image import max_pool2d

# x0_5: per-stage (repeats, out channels).
SHUFFLENET_V2_X0_5 = ((4, 48), (8, 96), (4, 192))
_STEM = 24


def _shuffle(x):
    """Channel shuffle, groups=2 (torchvision channel_shuffle)."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w, 2, c // 2).swapaxes(-1, -2).reshape(n, h, w, c)


class ShuffleBlock(nn.Module):
    """torchvision ShuffleNetV2 InvertedResidual."""

    out: int
    stride: int

    @nn.compact
    def __call__(self, x):
        half = self.out // 2

        def branch2(y):
            y = nn.Conv(half, (1, 1), use_bias=False, name="b2_pw1")(y)
            y = nn.relu(BatchNorm(name="b2_bn1")(y))
            y = nn.Conv(half, (3, 3), strides=self.stride, padding=1,
                        feature_group_count=half, use_bias=False,
                        name="b2_dw")(y)
            y = BatchNorm(name="b2_bn2")(y)
            y = nn.Conv(half, (1, 1), use_bias=False, name="b2_pw2")(y)
            return nn.relu(BatchNorm(name="b2_bn3")(y))

        if self.stride == 1:
            c = x.shape[-1] // 2
            x1, x2 = x[..., :c], x[..., c:]
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            c = x.shape[-1]
            b1 = nn.Conv(c, (3, 3), strides=self.stride, padding=1,
                         feature_group_count=c, use_bias=False,
                         name="b1_dw")(x)
            b1 = BatchNorm(name="b1_bn1")(b1)
            b1 = nn.Conv(half, (1, 1), use_bias=False, name="b1_pw")(b1)
            b1 = nn.relu(BatchNorm(name="b1_bn2")(b1))
            out = jnp.concatenate([b1, branch2(x)], axis=-1)
        return _shuffle(out)


class ShuffleNetV2Stages(nn.Module):
    """NHWC input → 4 feature maps (/4 24ch, /8 48, /16 96, /32 192)."""

    stages: tuple = SHUFFLENET_V2_X0_5

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        x = nn.Conv(_STEM, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(BatchNorm(name="bn1")(x))
        x = max_pool2d(x, 3, 2, padding=1)
        outs = [x]
        for si, (reps, out) in enumerate(self.stages, start=2):
            for bi in range(reps):
                x = ShuffleBlock(out, stride=2 if bi == 0 else 1,
                                 name=f"stage{si}_{bi}")(x)
            outs.append(x)
        return outs


def convert_shufflenet_state(state: Mapping[str, np.ndarray],
                             stages=SHUFFLENET_V2_X0_5) -> dict:
    """torchvision shufflenet_v2 state dict → module variables."""
    params: Dict = {}
    stats: Dict = {}

    def dw(t):
        return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))

    put(params, "conv1/kernel", conv_w(state["conv1.0.weight"]))
    bn_from_torch(params, stats, "bn1", state, "conv1.1")
    for si, (reps, out) in enumerate(stages, start=2):
        for bi in range(reps):
            src = f"stage{si}.{bi}"
            dst = f"stage{si}_{bi}"
            if bi == 0:  # stride-2 block has branch1
                put(params, f"{dst}/b1_dw/kernel",
                    dw(state[f"{src}.branch1.0.weight"]))
                bn_from_torch(params, stats, f"{dst}/b1_bn1", state,
                              f"{src}.branch1.1")
                put(params, f"{dst}/b1_pw/kernel",
                    conv_w(state[f"{src}.branch1.2.weight"]))
                bn_from_torch(params, stats, f"{dst}/b1_bn2", state,
                              f"{src}.branch1.3")
            put(params, f"{dst}/b2_pw1/kernel",
                conv_w(state[f"{src}.branch2.0.weight"]))
            bn_from_torch(params, stats, f"{dst}/b2_bn1", state,
                          f"{src}.branch2.1")
            put(params, f"{dst}/b2_dw/kernel",
                dw(state[f"{src}.branch2.3.weight"]))
            bn_from_torch(params, stats, f"{dst}/b2_bn2", state,
                          f"{src}.branch2.4")
            put(params, f"{dst}/b2_pw2/kernel",
                conv_w(state[f"{src}.branch2.5.weight"]))
            bn_from_torch(params, stats, f"{dst}/b2_bn3", state,
                          f"{src}.branch2.6")
    return {"params": params, "batch_stats": stats}
