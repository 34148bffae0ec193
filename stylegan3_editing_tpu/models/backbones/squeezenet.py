"""SqueezeNet-1.1 feature stack for LPIPS (flax NHWC).

Architecture parity: torchvision `squeezenet1_1().features` as sliced by the
reference LPIPS (/root/reference/criteria/lpips/networks.py:65-72) — seven
feature taps at 1-based module indices (2, 5, 8, 10, 11, 12, 13), channel
list (64, 128, 256, 384, 384, 512, 512). Fire modules follow the SqueezeNet
paper: 1×1 squeeze → ReLU → concat(1×1 expand, 3×3 expand), each expansion
ReLU'd.
"""

from __future__ import annotations

from typing import List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.image import max_pool2d
from .common import conv_w, put

N_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


class Fire(nn.Module):
    """SqueezeNet Fire: squeeze 1×1 → ReLU → [expand 1×1 ‖ expand 3×3]."""

    squeeze: int
    expand: int  # per-branch width; output channels = 2 * expand

    @nn.compact
    def __call__(self, x) -> jax.Array:
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """NHWC input → list of 7 feature maps at the LPIPS tap points."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        x = nn.Conv(64, (3, 3), strides=2, padding=0, name="conv0")(x)
        x = nn.relu(x)
        feats.append(x)                                   # tap: module 2
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = Fire(16, 64, name="fire3")(x)
        x = Fire(16, 64, name="fire4")(x)
        feats.append(x)                                   # tap: module 5
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = Fire(32, 128, name="fire6")(x)
        x = Fire(32, 128, name="fire7")(x)
        feats.append(x)                                   # tap: module 8
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = Fire(48, 192, name="fire9")(x)
        feats.append(x)                                   # tap: module 10
        x = Fire(48, 192, name="fire10")(x)
        feats.append(x)                                   # tap: module 11
        x = Fire(64, 256, name="fire11")(x)
        feats.append(x)                                   # tap: module 12
        x = Fire(64, 256, name="fire12")(x)
        feats.append(x)                                   # tap: module 13
        return feats


def convert_squeezenet_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision squeezenet1_1 state dict (features.N.*) → params."""
    params: dict = {}
    put(params, "conv0/kernel", conv_w(state["features.0.weight"]))
    put(params, "conv0/bias", state["features.0.bias"])
    for idx in (3, 4, 6, 7, 9, 10, 11, 12):
        for branch in ("squeeze", "expand1x1", "expand3x3"):
            put(params, f"fire{idx}/{branch}/kernel",
                conv_w(state[f"features.{idx}.{branch}.weight"]))
            put(params, f"fire{idx}/{branch}/bias",
                state[f"features.{idx}.{branch}.bias"])
    return {"params": params}
