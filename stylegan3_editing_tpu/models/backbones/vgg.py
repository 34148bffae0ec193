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
from .common import conv_w, put

N_CHANNELS = (64, 128, 256, 512, 512)
_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
_STAGES19 = ((64, 64), (128, 128), (256,) * 4, (512,) * 4, (512,) * 4)


class VGGFeatures(nn.Module):
    """NHWC input → list of 5 feature maps (end of each conv stage);
    `stages` selects the depth (vgg16 default, vgg19 via _STAGES19)."""

    stages: tuple = _STAGES

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        conv_idx = 0
        for stage_i, widths in enumerate(self.stages):
            if stage_i > 0:
                x = max_pool2d(x, 2, 2)
            for width in widths:
                x = nn.Conv(width, (3, 3), padding=1, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
        return feats


def VGG16Features(**kw):
    return VGGFeatures(stages=_STAGES, **kw)


def VGG19Features(**kw):
    return VGGFeatures(stages=_STAGES19, **kw)


def _convert_vgg_state(state: Mapping[str, np.ndarray], stages) -> dict:
    """torchvision vggN state dict (features.N.*) → params: conv layers sit
    at sequential `features` indices skipping ReLU (+MaxPool between
    stages)."""
    params: dict = {}
    ours = 0
    theirs = 0
    for stage_i, widths in enumerate(stages):
        if stage_i > 0:
            theirs += 1  # MaxPool2d entry
        for _ in widths:
            put(params, f"conv{ours}/kernel",
                conv_w(state[f"features.{theirs}.weight"]))
            put(params, f"conv{ours}/bias", state[f"features.{theirs}.bias"])
            ours += 1
            theirs += 2  # Conv2d + ReLU
    return {"params": params}


def convert_vgg16_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg16 state dict (features.N.*) → params."""
    return _convert_vgg_state(state, _STAGES)


def convert_vgg19_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg19 state dict (features.N.*) → params."""
    return _convert_vgg_state(state, _STAGES19)
