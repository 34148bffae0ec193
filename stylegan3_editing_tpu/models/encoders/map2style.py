"""map2style head: strided convs collapsing a feature map to one style.

Parity: reference `GradualStyleBlock`
(/root/reference/models/setgan/encoder/encoders/map2style.py:8-25) — log2(S)
stride-2 3×3 convs with LeakyReLU(0.01) collapsing S×S → 1×1, then an
equalized-LR linear (rosinality EqualLinear ≡ our FullyConnected).
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax

from ..sg3.layers import FullyConnected


class GradualStyleBlock(nn.Module):
    out_c: int
    spatial: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        num_pools = int(np.log2(self.spatial))
        for i in range(num_pools):
            x = nn.Conv(self.out_c, (3, 3), strides=2, padding=1,
                        name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.01)
        x = x.reshape(x.shape[0], self.out_c)
        return FullyConnected(self.out_c, name="linear")(x)
