"""ResNet-50 feature extractor (flax NHWC) for the MoCo loss.

Architecture parity: torchvision `resnet50()` minus the fc head, as loaded by
the reference MoCo loss (/root/reference/criteria/moco_loss.py:17-39).
The converter accepts both plain torchvision naming and MoCo checkpoints
(`module.encoder_q.*` prefixes are stripped by the caller).
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.image import avg_pool2d, max_pool2d
from .common import BatchNorm, bn_from_torch, conv_w, put

_STAGES = ((3, 64, 256, 1), (4, 128, 512, 2), (6, 256, 1024, 2), (3, 512, 2048, 2))


class Bottleneck(nn.Module):
    width: int
    out_channels: int
    stride: int
    downsample: bool
    se: bool = False  # timm seresnet: SE (reduction 16) before the residual add
    avg_down: bool = False  # timm -d variants: AvgPool2d + 1x1 s1 downsample

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, train=train)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, train=train)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, train=train)
        if self.se:
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(self.out_channels // 16, (1, 1),
                                name="se_fc1")(s))
            s = nn.Conv(self.out_channels, (1, 1), name="se_fc2")(s)
            y = y * nn.sigmoid(s)
        if self.downsample:
            identity = x
            if self.avg_down:
                if self.stride > 1:
                    identity = avg_pool2d(identity, 2, self.stride)
                identity = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                                   name="down_conv")(identity)
            else:
                identity = nn.Conv(self.out_channels, (1, 1),
                                   strides=self.stride, use_bias=False,
                                   name="down_conv")(identity)
            identity = BatchNorm(name="down_bn")(identity, train=train)
        return nn.relu(y + identity)


class ResNet50Features(nn.Module):
    """NHWC input → [N, 2048] global-average-pooled features."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train=train)
        x = nn.relu(x)
        x = max_pool2d(x, 3, 2, padding=1)
        for stage_i, (blocks, width, out_c, stride) in enumerate(_STAGES, start=1):
            for block_i in range(blocks):
                x = Bottleneck(
                    width, out_c,
                    stride=stride if block_i == 0 else 1,
                    downsample=block_i == 0,
                    name=f"layer{stage_i}_{block_i}")(x, train=train)
        return jnp.mean(x, axis=(1, 2))


class BasicBlock(nn.Module):
    """ResNet-18/34 basic block (used by the ResNet encoder trunks)."""

    channels: int
    stride: int
    downsample: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, train=train)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = BatchNorm(name="bn2")(y, train=train)
        if self.downsample:
            identity = nn.Conv(self.channels, (1, 1), strides=self.stride,
                               use_bias=False, name="down_conv")(x)
            identity = BatchNorm(name="down_bn")(identity, train=train)
        return nn.relu(y + identity)


RESNET34_LAYERS = ((3, 64), (4, 128), (6, 256), (3, 512))


class ResNet34Body(nn.Module):
    """torchvision resnet34 layer1-4 (no stem), as used by the ReStyle
    ResNet encoders (restyle_psp_encoders.py:69-81)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        for stage_i, (blocks, channels) in enumerate(RESNET34_LAYERS, start=1):
            for block_i in range(blocks):
                stride = 2 if (stage_i > 1 and block_i == 0) else 1
                downsample = block_i == 0 and stage_i > 1
                x = BasicBlock(channels, stride, downsample,
                               name=f"layer{stage_i}_{block_i}")(x, train=train)
        return x


def convert_resnet34_body_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision resnet34 state dict (layerN.M.*) → ResNet34Body variables."""
    params: dict = {}
    stats: dict = {}
    for stage_i, (blocks, _) in enumerate(RESNET34_LAYERS, start=1):
        for block_i in range(blocks):
            t = f"layer{stage_i}.{block_i}"
            o = f"layer{stage_i}_{block_i}"
            for ci in (1, 2):
                put(params, f"{o}/conv{ci}/kernel",
                    conv_w(state[f"{t}.conv{ci}.weight"]))
                bn_from_torch(params, stats, f"{o}/bn{ci}", state, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in state:
                put(params, f"{o}/down_conv/kernel",
                    conv_w(state[f"{t}.downsample.0.weight"]))
                bn_from_torch(params, stats, f"{o}/down_bn", state,
                              f"{t}.downsample.1")
    return {"params": params, "batch_stats": stats}


def convert_bottleneck_stages_state(state: Mapping[str, np.ndarray],
                                    stages=_STAGES, se: bool = False) -> dict:
    """torchvision/timm bottleneck-ResNet state dict → {'params',
    'batch_stats'} for any BOTTLENECK_STAGES family (timm seresnet50 keeps
    its SE convs under `layerN.M.se.fc{1,2}`; -d variants use the deep
    `conv1.{0,3,6}` stem and `downsample.{1,2}` avg-pool layout)."""
    params: dict = {}
    stats: dict = {}
    if "conv1.0.weight" in state:  # deep stem (timm resnet26d/50d)
        for i, src in enumerate((0, 3)):
            put(params, f"conv1_{i}/kernel",
                conv_w(state[f"conv1.{src}.weight"]))
            bn_from_torch(params, stats, f"bn1_{i}", state,
                          f"conv1.{src + 1}")
        put(params, "conv1_2/kernel", conv_w(state["conv1.6.weight"]))
        bn_from_torch(params, stats, "bn1", state, "bn1")
    else:
        put(params, "conv1/kernel", conv_w(state["conv1.weight"]))
        bn_from_torch(params, stats, "bn1", state, "bn1")
    for stage_i, (blocks, _, _, _) in enumerate(stages, start=1):
        for block_i in range(blocks):
            t = f"layer{stage_i}.{block_i}"
            o = f"layer{stage_i}_{block_i}"
            for ci in (1, 2, 3):
                put(params, f"{o}/conv{ci}/kernel",
                    conv_w(state[f"{t}.conv{ci}.weight"]))
                bn_from_torch(params, stats, f"{o}/bn{ci}", state, f"{t}.bn{ci}")
            if se:
                for fc in (1, 2):
                    put(params, f"{o}/se_fc{fc}/kernel",
                        conv_w(state[f"{t}.se.fc{fc}.weight"]))
                    put(params, f"{o}/se_fc{fc}/bias",
                        np.asarray(state[f"{t}.se.fc{fc}.bias"]))
            if f"{t}.downsample.0.weight" in state:
                put(params, f"{o}/down_conv/kernel",
                    conv_w(state[f"{t}.downsample.0.weight"]))
                bn_from_torch(params, stats, f"{o}/down_bn", state,
                              f"{t}.downsample.1")
            elif f"{t}.downsample.1.weight" in state:  # avg_down layout
                put(params, f"{o}/down_conv/kernel",
                    conv_w(state[f"{t}.downsample.1.weight"]))
                bn_from_torch(params, stats, f"{o}/down_bn", state,
                              f"{t}.downsample.2")
    return {"params": params, "batch_stats": stats}


def convert_resnet50_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision resnet50 state dict → {'params', 'batch_stats'}."""
    return convert_bottleneck_stages_state(state, _STAGES)


# Per-stage (blocks, bottleneck width, out channels, stride). Depth variants
# share the torchvision bottleneck; wide_* doubles the 3×3 width
# (reference families resnet50/101/152, wide_resnet50_2/101_2, seresnet50 —
# pretrained_builder.py:238-257, 310-314, all sliced by _make_resnet:22-30).
BOTTLENECK_STAGES = {
    "resnet50": _STAGES,
    "resnet101": ((3, 64, 256, 1), (4, 128, 512, 2),
                  (23, 256, 1024, 2), (3, 512, 2048, 2)),
    "resnet152": ((3, 64, 256, 1), (8, 128, 512, 2),
                  (36, 256, 1024, 2), (3, 512, 2048, 2)),
    "wide_resnet50_2": ((3, 128, 256, 1), (4, 256, 512, 2),
                        (6, 512, 1024, 2), (3, 1024, 2048, 2)),
    "wide_resnet101_2": ((3, 128, 256, 1), (4, 256, 512, 2),
                         (23, 512, 1024, 2), (3, 1024, 2048, 2)),
    "seresnet50": _STAGES,
    "resnet26": ((2, 64, 256, 1), (2, 128, 512, 2),
                 (2, 256, 1024, 2), (2, 512, 2048, 2)),
}


class ResNetBottleneckStages(nn.Module):
    """torchvision bottleneck ResNets sliced into the 4-stage feature contract
    (/4, /8, /16, /32; out channels 256·(1,2,4,8)) — reference
    pretrained_builder._make_resnet (pretrained_builder.py:22-30).
    Same parameter naming as ResNet50Features → the converters fit."""

    stages: tuple = _STAGES
    se: bool = False
    deep_stem: bool = False  # timm -d variants: 3x3 conv triplet stem (32,32,64)
    avg_down: bool = False   # timm -d variants: AvgPool in the downsample path

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deep_stem:
            for i, w in enumerate((32, 32, 64)):
                x = nn.Conv(w, (3, 3), strides=2 if i == 0 else 1, padding=1,
                            use_bias=False, name=f"conv1_{i}")(x)
                if i < 2:
                    x = nn.relu(BatchNorm(name=f"bn1_{i}")(x, train=train))
            x = BatchNorm(name="bn1")(x, train=train)
            x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        name="conv1")(x)
            x = BatchNorm(name="bn1")(x, train=train)
            x = nn.relu(x)
        x = max_pool2d(x, 3, 2, padding=1)
        outs = []
        for stage_i, (blocks, width, out_c, stride) in enumerate(self.stages,
                                                                 start=1):
            for block_i in range(blocks):
                x = Bottleneck(
                    width, out_c,
                    stride=stride if block_i == 0 else 1,
                    downsample=block_i == 0, se=self.se,
                    avg_down=self.avg_down,
                    name=f"layer{stage_i}_{block_i}")(x, train=train)
            outs.append(x)
        return outs


def ResNet50Stages(**kw):
    return ResNetBottleneckStages(stages=_STAGES, **kw)


RESNET18_LAYERS = ((2, 64), (2, 128), (2, 256), (2, 512))


class ResNetBasicStages(nn.Module):
    """torchvision resnet18/34 (with stem) sliced into 4 stages
    (/4 64ch, /8 128ch, /16 256ch, /32 512ch); `layers` selects the depth
    (reference pretrained_builder resnet18/resnet34 families,
    pretrained_builder.py:118-130)."""

    layers: tuple = RESNET34_LAYERS

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train=train)
        x = nn.relu(x)
        x = max_pool2d(x, 3, 2, padding=1)
        outs = []
        for stage_i, (blocks, channels) in enumerate(self.layers, start=1):
            for block_i in range(blocks):
                stride = 2 if (stage_i > 1 and block_i == 0) else 1
                downsample = block_i == 0 and stage_i > 1
                x = BasicBlock(channels, stride, downsample,
                               name=f"layer{stage_i}_{block_i}")(x, train=train)
            outs.append(x)
        return outs


def ResNet34Stages(**kw):
    return ResNetBasicStages(layers=RESNET34_LAYERS, **kw)


def ResNet18Stages(**kw):
    return ResNetBasicStages(layers=RESNET18_LAYERS, **kw)


def _convert_basic_stages_state(state: Mapping[str, np.ndarray],
                                layers) -> dict:
    params: dict = {}
    stats: dict = {}
    put(params, "conv1/kernel", conv_w(state["conv1.weight"]))
    bn_from_torch(params, stats, "bn1", state, "bn1")
    for stage_i, (blocks, _) in enumerate(layers, start=1):
        for block_i in range(blocks):
            t = f"layer{stage_i}.{block_i}"
            o = f"layer{stage_i}_{block_i}"
            for ci in (1, 2):
                put(params, f"{o}/conv{ci}/kernel",
                    conv_w(state[f"{t}.conv{ci}.weight"]))
                bn_from_torch(params, stats, f"{o}/bn{ci}", state, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in state:
                put(params, f"{o}/down_conv/kernel",
                    conv_w(state[f"{t}.downsample.0.weight"]))
                bn_from_torch(params, stats, f"{o}/down_bn", state,
                              f"{t}.downsample.1")
    return {"params": params, "batch_stats": stats}


def convert_resnet34_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision resnet34 state dict (incl. stem) → ResNet34Stages vars."""
    return _convert_basic_stages_state(state, RESNET34_LAYERS)


def convert_resnet18_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision resnet18 state dict (incl. stem) → ResNet18Stages vars."""
    return _convert_basic_stages_state(state, RESNET18_LAYERS)
