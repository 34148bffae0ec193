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


class VGG16Features(nn.Module):
    """NHWC input → list of 5 feature maps (end of each conv stage)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        conv_idx = 0
        for stage_i, widths in enumerate(_STAGES):
            if stage_i > 0:
                x = max_pool2d(x, 2, 2)
            for width in widths:
                x = nn.Conv(width, (3, 3), padding=1, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
        return feats


def convert_vgg16_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg16 state dict (features.N.*) → params."""
    torch_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    params: dict = {}
    for ours, theirs in enumerate(torch_idx):
        put(params, f"conv{ours}/kernel", conv_w(state[f"features.{theirs}.weight"]))
        put(params, f"conv{ours}/bias", state[f"features.{theirs}.bias"])
    return {"params": params}
