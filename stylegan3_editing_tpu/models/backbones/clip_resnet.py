"""CLIP ModifiedResNet-50 visual trunk (flax NHWC) for the projected D.

Parity: OpenAI CLIP RN50's `visual` tower sliced by the reference's
`_make_resnet_clip` (/root/reference/models/styleganxl/feature_networks/
pretrained_builder.py:60-82, 402-404): layer0 = 3-conv stem + avgpool +
layer1 (/4 256ch), layer1-3 = layer2/3/4 (512/1024/2048 at /8 /16 /32).
ModifiedResNet differences vs torchvision (clip/model.py:93-124): 3-conv
stem with AvgPool2d(2) instead of maxpool; anti-aliased striding — all convs
stride 1, an AvgPool2d(stride) sits after conv2 and prepends the downsample
projection. The attention-pool head is not part of the feature slice.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import numpy as np

from ...ops.image import avg_pool2d
from .common import BatchNorm, bn_from_torch, conv_w, put

# RN50: (blocks per layer, width). Stage out channels = width*4 doublings.
_RN50_LAYERS = (3, 4, 6, 3)
_WIDTH = 64


class CLIPBottleneck(nn.Module):
    """clip/model.py Bottleneck: stride lives in an avgpool, not the convs."""

    planes: int
    stride: int

    @nn.compact
    def __call__(self, x):
        out_c = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(BatchNorm(name="bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.relu(BatchNorm(name="bn2")(y))
        if self.stride > 1:
            y = avg_pool2d(y, self.stride, self.stride)
        y = nn.Conv(out_c, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y)
        if self.stride > 1 or x.shape[-1] != out_c:
            idn = avg_pool2d(x, self.stride, self.stride) \
                if self.stride > 1 else x
            idn = nn.Conv(out_c, (1, 1), use_bias=False, name="down_conv")(idn)
            idn = BatchNorm(name="down_bn")(idn)
        else:
            idn = x
        return nn.relu(y + idn)


class CLIPResNet50Stages(nn.Module):
    """NHWC input → 4 feature maps (/4 256ch, /8 512, /16 1024, /32 2048)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        for i, width in enumerate((_WIDTH // 2, _WIDTH // 2, _WIDTH), start=1):
            x = nn.Conv(width, (3, 3), strides=2 if i == 1 else 1, padding=1,
                        use_bias=False, name=f"stem_conv{i}")(x)
            x = nn.relu(BatchNorm(name=f"stem_bn{i}")(x))
        x = avg_pool2d(x, 2, 2)
        outs = []
        for li, n in enumerate(_RN50_LAYERS, start=1):
            planes = _WIDTH * (2 ** (li - 1))
            for bi in range(n):
                x = CLIPBottleneck(planes,
                                   stride=2 if (bi == 0 and li > 1) else 1,
                                   name=f"layer{li}_{bi}")(x)
            outs.append(x)
        return outs


def convert_clip_resnet_state(state: Mapping[str, np.ndarray]) -> dict:
    """CLIP RN50 state dict (`visual.`-prefixed or bare) → variables."""
    state = {(k[len("visual."):] if k.startswith("visual.") else k): v
             for k, v in state.items()}
    params: Dict = {}
    stats: Dict = {}
    for i in (1, 2, 3):
        put(params, f"stem_conv{i}/kernel", conv_w(state[f"conv{i}.weight"]))
        bn_from_torch(params, stats, f"stem_bn{i}", state, f"bn{i}")
    for li, n in enumerate(_RN50_LAYERS, start=1):
        for bi in range(n):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            for ci in (1, 2, 3):
                put(params, f"{dst}/conv{ci}/kernel",
                    conv_w(state[f"{src}.conv{ci}.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn{ci}", state,
                              f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in state:
                put(params, f"{dst}/down_conv/kernel",
                    conv_w(state[f"{src}.downsample.0.weight"]))
                bn_from_torch(params, stats, f"{dst}/down_bn", state,
                              f"{src}.downsample.1")
    return {"params": params, "batch_stats": stats}
