"""VGG16 feature stack for LPIPS (flax NHWC).

Architecture parity: torchvision `vgg16().features` as sliced by the
reference LPIPS (/root/reference/criteria/lpips/networks.py:87-94) — taps
after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3.
"""

from __future__ import annotations

from typing import List, Mapping

import flax.linen as nn
import jax
import numpy as np

from ...ops.image import max_pool2d
from .common import BatchNorm, bn_from_torch, conv_w, put

N_CHANNELS = (64, 128, 256, 512, 512)
_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
_STAGES19 = ((64, 64), (128, 128), (256,) * 4, (512,) * 4, (512,) * 4)
_STAGES11 = ((64,), (128,), (256, 256), (512, 512), (512, 512))
_STAGES13 = ((64, 64), (128, 128), (256, 256), (512, 512), (512, 512))


class VGGFeatures(nn.Module):
    """NHWC input → list of 5 feature maps (end of each conv stage);
    `stages` selects the depth (vgg16 default, vgg19 via _STAGES19);
    `bn=True` is the torchvision vgg*_bn layout (Conv→BN→ReLU)."""

    stages: tuple = _STAGES
    bn: bool = False

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        conv_idx = 0
        for stage_i, widths in enumerate(self.stages):
            if stage_i > 0:
                x = max_pool2d(x, 2, 2)
            for width in widths:
                # torchvision keeps conv bias even under BN.
                x = nn.Conv(width, (3, 3), padding=1, name=f"conv{conv_idx}")(x)
                if self.bn:
                    x = BatchNorm(name=f"bn{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
        return feats


def VGG16Features(**kw):
    return VGGFeatures(stages=_STAGES, **kw)


def VGG19Features(**kw):
    return VGGFeatures(stages=_STAGES19, **kw)


def _convert_vgg_state(state: Mapping[str, np.ndarray], stages,
                       bn: bool = False) -> dict:
    """torchvision vggN state dict (features.N.*) → params: conv layers sit
    at sequential `features` indices skipping ReLU (and BatchNorm for the
    _bn variants), +MaxPool between stages."""
    params: dict = {}
    stats: dict = {}
    ours = 0
    theirs = 0
    for stage_i, widths in enumerate(stages):
        if stage_i > 0:
            theirs += 1  # MaxPool2d entry
        for _ in widths:
            put(params, f"conv{ours}/kernel",
                conv_w(state[f"features.{theirs}.weight"]))
            put(params, f"conv{ours}/bias", state[f"features.{theirs}.bias"])
            if bn:
                bn_from_torch(params, stats, f"bn{ours}", state,
                              f"features.{theirs + 1}")
            ours += 1
            theirs += 3 if bn else 2  # Conv2d + [BatchNorm2d +] ReLU
    return {"params": params, "batch_stats": stats} if bn else {"params": params}


def convert_vgg16_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg16 state dict (features.N.*) → params."""
    return _convert_vgg_state(state, _STAGES)


def convert_vgg19_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg19 state dict (features.N.*) → params."""
    return _convert_vgg_state(state, _STAGES19)


# name → (stage config, batch_norm) for the torchvision families the
# reference's builder slices (constants.py TORCHVISION, vgg*_bn entries).
VGG_FAMILIES = {
    "vgg11_bn": (_STAGES11, True),
    "vgg13_bn": (_STAGES13, True),
    "vgg16": (_STAGES, False),
    "vgg16_bn": (_STAGES, True),
    "vgg19": (_STAGES19, False),
    "vgg19_bn": (_STAGES19, True),
}


def make_vgg(name: str):
    """'vggNN[_bn]' → (5-stage module factory, converter)."""
    stages, bn = VGG_FAMILIES[name]

    def make(**kw):
        return VGGFeatures(stages=stages, bn=bn, **kw)

    def convert(st):
        return _convert_vgg_state(st, stages, bn=bn)

    return make, convert
