"""AlexNet feature stack for LPIPS (flax NHWC).

Architecture parity: torchvision `alexnet().features` as sliced by the
reference LPIPS (/root/reference/criteria/lpips/networks.py:76-84) — five
feature taps after each ReLU, channel list (64, 192, 384, 256, 256).
"""

from __future__ import annotations

from typing import List, Mapping

import flax.linen as nn
import jax
import numpy as np

from ...ops.image import max_pool2d
from .common import conv_w, put

N_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """NHWC input → list of 5 feature maps (after each ReLU)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        x = nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x)
        x = nn.relu(x)
        feats.append(x)
        x = max_pool2d(x, 3, 2)
        x = nn.Conv(192, (5, 5), padding=2, name="conv1")(x)
        x = nn.relu(x)
        feats.append(x)
        x = max_pool2d(x, 3, 2)
        x = nn.Conv(384, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv3")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv4")(x)
        x = nn.relu(x)
        feats.append(x)
        return feats


def convert_alexnet_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision alexnet state dict (features.N.*) → params."""
    params: dict = {}
    torch_idx = (0, 3, 6, 8, 10)
    for ours, theirs in enumerate(torch_idx):
        put(params, f"conv{ours}/kernel", conv_w(state[f"features.{theirs}.weight"]))
        put(params, f"conv{ours}/bias", state[f"features.{theirs}.bias"])
    return {"params": params}
