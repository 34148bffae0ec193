"""IR / IR-SE face-recognition backbones (ArcFace-style), flax NHWC.

Architecture parity: reference `Backbone` / `bottleneck_IR(_SE)` / `SEModule`
(/root/reference/models/setgan/encoder/encoders/{model_irse.py,helpers.py}),
the net behind the ID loss (criteria/id_loss.py:12), the CurricularFace
IR-101 metric, and the trunk of every inversion encoder.

The converter maps InsightFace-style torch state dicts (input_layer.*,
body.N.*, output_layer.*) onto this tree, so released ir_se50 /
CurricularFace weights drop in.
"""

from __future__ import annotations

import dataclasses
from typing import List, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm, PReLU, bn_from_torch, conv_w, dense_w, put


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    in_channel: int
    depth: int
    stride: int


def get_blocks(num_layers: int) -> List[List[BlockSpec]]:
    def stage(in_channel, depth, num_units, stride=2):
        return [BlockSpec(in_channel, depth, stride)] + [
            BlockSpec(depth, depth, 1) for _ in range(num_units - 1)]

    if num_layers == 50:
        units = (3, 4, 14, 3)
    elif num_layers == 100:
        units = (3, 13, 30, 3)
    elif num_layers == 152:
        units = (3, 8, 36, 3)
    elif num_layers == 8:
        # Minimal 4-stage trunk (one bottleneck per stage) — NOT a reference
        # depth (those are 50/100/152); exists for CI smoke / dryrun graphs
        # where compile time matters and pretrained weights don't.
        units = (1, 1, 1, 1)
    else:
        raise ValueError(f"num_layers must be 8/50/100/152, got {num_layers}")
    chans = ((64, 64), (64, 128), (128, 256), (256, 512))
    return [stage(i, d, n) for (i, d), n in zip(chans, units)]


class SEModule(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIR(nn.Module):
    spec: BlockSpec
    use_se: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        if s.in_channel == s.depth:
            shortcut = x[:, ::s.stride, ::s.stride, :]  # MaxPool2d(1, stride)
        else:
            shortcut = nn.Conv(s.depth, (1, 1), strides=s.stride,
                               use_bias=False, name="shortcut_conv")(x)
            shortcut = BatchNorm(name="shortcut_bn")(shortcut, train=train)
        r = BatchNorm(name="bn1")(x, train=train)
        r = nn.Conv(s.depth, (3, 3), padding=1, use_bias=False, name="conv1")(r)
        r = PReLU(name="prelu")(r)
        r = nn.Conv(s.depth, (3, 3), strides=s.stride, padding=1,
                    use_bias=False, name="conv2")(r)
        r = BatchNorm(name="bn2")(r, train=train)
        if self.use_se:
            r = SEModule(name="se")(r)
        return r + shortcut


class IRSEBackbone(nn.Module):
    """Full face net: 112/224 NHWC input → l2-normalized 512-d embedding."""

    input_size: int = 112
    num_layers: int = 50
    mode: str = "ir_se"  # 'ir' | 'ir_se'
    drop_ratio: float = 0.6
    affine: bool = True  # affine of the final 1-D batch norm

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.input_size in (112, 224)
        assert x.shape[1] == x.shape[2] == self.input_size
        use_se = self.mode == "ir_se"

        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="input_conv")(x)
        x = BatchNorm(name="input_bn")(x, train=train)
        x = PReLU(name="input_prelu")(x)

        idx = 0
        for stage in get_blocks(self.num_layers):
            for spec in stage:
                x = BottleneckIR(spec, use_se, name=f"body_{idx}")(x, train=train)
                idx += 1

        x = BatchNorm(name="output_bn")(x, train=train)
        x = nn.Dropout(self.drop_ratio, deterministic=not train)(x)
        # torch flattens NCHW (C-major); transpose so released linear weights
        # apply unchanged.
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.Dense(512, name="output_linear")(x)
        x = BatchNorm(affine=self.affine, name="output_bn1d")(x, train=train)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def convert_irse_state(state: Mapping[str, np.ndarray], num_layers: int = 50,
                       affine: bool = True) -> dict:
    """torch Backbone state dict → {'params', 'batch_stats'} variables."""
    params: dict = {}
    stats: dict = {}

    put(params, "input_conv/kernel", conv_w(state["input_layer.0.weight"]))
    bn_from_torch(params, stats, "input_bn", state, "input_layer.1")
    put(params, "input_prelu/alpha", state["input_layer.2.weight"])

    idx = 0
    for stage in get_blocks(num_layers):
        for spec in stage:
            t = f"body.{idx}"
            o = f"body_{idx}"
            if spec.in_channel != spec.depth:
                put(params, f"{o}/shortcut_conv/kernel",
                    conv_w(state[f"{t}.shortcut_layer.0.weight"]))
                bn_from_torch(params, stats, f"{o}/shortcut_bn", state,
                              f"{t}.shortcut_layer.1")
            bn_from_torch(params, stats, f"{o}/bn1", state, f"{t}.res_layer.0")
            put(params, f"{o}/conv1/kernel", conv_w(state[f"{t}.res_layer.1.weight"]))
            put(params, f"{o}/prelu/alpha", state[f"{t}.res_layer.2.weight"])
            put(params, f"{o}/conv2/kernel", conv_w(state[f"{t}.res_layer.3.weight"]))
            bn_from_torch(params, stats, f"{o}/bn2", state, f"{t}.res_layer.4")
            if f"{t}.res_layer.5.fc1.weight" in state:
                put(params, f"{o}/se/fc1/kernel",
                    conv_w(state[f"{t}.res_layer.5.fc1.weight"]))
                put(params, f"{o}/se/fc2/kernel",
                    conv_w(state[f"{t}.res_layer.5.fc2.weight"]))
            idx += 1

    bn_from_torch(params, stats, "output_bn", state, "output_layer.0")
    put(params, "output_linear/kernel", dense_w(state["output_layer.3.weight"]))
    put(params, "output_linear/bias", state["output_layer.3.bias"])
    bn_from_torch(params, stats, "output_bn1d", state, "output_layer.4",
                  affine=affine)
    return {"params": params, "batch_stats": stats}
