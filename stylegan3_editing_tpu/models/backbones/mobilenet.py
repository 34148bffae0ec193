"""MobileNetV2 / MNASNet feature extractors (flax NHWC) for the projected D.

Parity: torchvision `mobilenet_v2` and `mnasnet0_5/1_0` sliced by the
reference's `_feature_splitter` (/root/reference/models/styleganxl/
feature_networks/pretrained_builder.py:14-20, 262-283): mobilenet_v2 at
feature indices [4, 7, 14, 18] (stage channels 24/32/96/320 at /4 /8 /16
/32), mnasnet at layer indices [9, 10, 12, 14]. Converters map the
torchvision state dicts onto the modules.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm, bn_from_torch, conv_w, put

_relu6 = lambda v: jnp.minimum(jax.nn.relu(v), 6.0)

# torchvision mobilenet_v2 features[1:18]: (expand t, out, stride).
MBV2_BLOCKS = (
    (1, 16, 1),
    (6, 24, 2), (6, 24, 1),
    (6, 32, 2), (6, 32, 1), (6, 32, 1),
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
    (6, 96, 1), (6, 96, 1), (6, 96, 1),
    (6, 160, 2), (6, 160, 1), (6, 160, 1),
    (6, 320, 1),
)
# Reference split indices [4, 7, 14, 18] → last block (= features index)
# inside each stage slice [0:4], [4:7], [7:14], [14:18].
_MBV2_STAGE_ENDS = (3, 6, 13, 17)


class MBV2Block(nn.Module):
    """torchvision InvertedResidual: [pw →] dw → pw-linear, ReLU6, BN."""

    expand: int
    out: int
    stride: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x
        if self.expand != 1:
            y = nn.Conv(c * self.expand, (1, 1), use_bias=False,
                        name="conv_pw")(y)
            y = BatchNorm(name="bn1")(y)
            y = _relu6(y)
        mid = y.shape[-1]
        y = nn.Conv(mid, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=mid, use_bias=False, name="conv_dw")(y)
        y = BatchNorm(name="bn2")(y)
        y = _relu6(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="conv_pwl")(y)
        y = BatchNorm(name="bn3")(y)
        if self.stride == 1 and c == self.out:
            y = y + x
        return y


class MobileNetV2Stages(nn.Module):
    """NHWC input → 4 feature maps (/4 24ch, /8 32ch, /16 96ch, /32 320ch)."""

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        x = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv_stem")(x)
        x = BatchNorm(name="bn_stem")(x)
        x = _relu6(x)
        outs = []
        for bi, (t, out, s) in enumerate(MBV2_BLOCKS, start=1):
            x = MBV2Block(t, out, s, name=f"block{bi}")(x)
            if bi in _MBV2_STAGE_ENDS:
                outs.append(x)
        return outs


def convert_mobilenet_v2_state(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision mobilenet_v2 state dict → module variables."""
    params: Dict = {}
    stats: Dict = {}

    def dw(t):  # [C,1,kh,kw] → HWIO [kh,kw,1,C]
        return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))

    put(params, "conv_stem/kernel", conv_w(state["features.0.0.weight"]))
    bn_from_torch(params, stats, "bn_stem", state, "features.0.1")
    for bi, (t, out, s) in enumerate(MBV2_BLOCKS, start=1):
        src = f"features.{bi}.conv"
        dst = f"block{bi}"
        if t == 1:  # dw ConvBNReLU, pw-linear conv, bn
            put(params, f"{dst}/conv_dw/kernel", dw(state[f"{src}.0.0.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn2", state, f"{src}.0.1")
            put(params, f"{dst}/conv_pwl/kernel", conv_w(state[f"{src}.1.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn3", state, f"{src}.2")
        else:
            put(params, f"{dst}/conv_pw/kernel", conv_w(state[f"{src}.0.0.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn1", state, f"{src}.0.1")
            put(params, f"{dst}/conv_dw/kernel", dw(state[f"{src}.1.0.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn2", state, f"{src}.1.1")
            put(params, f"{dst}/conv_pwl/kernel", conv_w(state[f"{src}.2.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn3", state, f"{src}.3")
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------------ MNASNet

def _round8(val: float) -> int:
    """torchvision mnasnet _round_to_multiple_of(val, 8)."""
    new_val = max(8, int(val + 4) // 8 * 8)
    if new_val < 0.9 * val:
        new_val += 8
    return new_val


# Base (alpha=1.0) stack configs, torchvision mnasnet layers[8:14]:
# (kernel, stride, expand, base out, repeats).
MNASNET_STACKS = (
    (3, 2, 3, 24, 3),
    (5, 2, 3, 40, 3),
    (5, 2, 6, 80, 3),
    (3, 1, 6, 96, 2),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
)
# Reference split indices [9, 10, 12, 14] over model.layers → stage = stacks
# [:1+stem], [1:2], [2:4], [4:6].
_MNAS_STAGE_ENDS = (0, 1, 3, 5)


def mnasnet_channels(alpha: float):
    """(stem depths, per-stack out channels) for torchvision mnasnet(alpha)."""
    stem = (_round8(32 * alpha), _round8(16 * alpha))
    outs = tuple(_round8(c * alpha) for (_, _, _, c, _) in MNASNET_STACKS)
    return stem, outs


class MnasBlock(nn.Module):
    """torchvision _InvertedResidual (BN eps 1e-5, ReLU)."""

    out: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = c * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        y = BatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, name="conv_dw")(y)
        y = BatchNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="conv_pwl")(y)
        y = BatchNorm(name="bn3")(y)
        if self.stride == 1 and c == self.out:
            y = y + x
        return y


class MNASNetStages(nn.Module):
    """torchvision mnasnet sliced at layers [9, 10, 12, 14]
    (pretrained_builder.py:267-283). `alpha` = 0.5 | 1.0."""

    alpha: float = 1.0

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        (c_stem, c_sep), outs = mnasnet_channels(self.alpha)
        x = nn.Conv(c_stem, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv_stem")(x)
        x = BatchNorm(name="bn_stem")(x)
        x = nn.relu(x)
        x = nn.Conv(c_stem, (3, 3), padding=1, feature_group_count=c_stem,
                    use_bias=False, name="conv_sep_dw")(x)
        x = BatchNorm(name="bn_sep_dw")(x)
        x = nn.relu(x)
        x = nn.Conv(c_sep, (1, 1), use_bias=False, name="conv_sep_pw")(x)
        x = BatchNorm(name="bn_sep_pw")(x)
        feats = []
        for si, ((k, s, t, _c, n), out) in enumerate(zip(MNASNET_STACKS, outs)):
            for bi in range(n):
                x = MnasBlock(out, k, s if bi == 0 else 1, t,
                              name=f"stack{si}_{bi}")(x)
            if si in _MNAS_STAGE_ENDS:
                feats.append(x)
        return feats


def convert_mnasnet_state(state: Mapping[str, np.ndarray],
                          alpha: float = 1.0) -> dict:
    """torchvision mnasnet state dict (`layers.N...`) → module variables."""
    params: Dict = {}
    stats: Dict = {}

    def dw(t):
        return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))

    put(params, "conv_stem/kernel", conv_w(state["layers.0.weight"]))
    bn_from_torch(params, stats, "bn_stem", state, "layers.1")
    put(params, "conv_sep_dw/kernel", dw(state["layers.3.weight"]))
    bn_from_torch(params, stats, "bn_sep_dw", state, "layers.4")
    put(params, "conv_sep_pw/kernel", conv_w(state["layers.6.weight"]))
    bn_from_torch(params, stats, "bn_sep_pw", state, "layers.7")
    for si, (k, s, t, _c, n) in enumerate(MNASNET_STACKS):
        for bi in range(n):
            src = f"layers.{8 + si}.{bi}.layers"
            dst = f"stack{si}_{bi}"
            put(params, f"{dst}/conv_pw/kernel", conv_w(state[f"{src}.0.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn1", state, f"{src}.1")
            put(params, f"{dst}/conv_dw/kernel", dw(state[f"{src}.3.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn2", state, f"{src}.4")
            put(params, f"{dst}/conv_pwl/kernel", conv_w(state[f"{src}.6.weight"]))
            bn_from_torch(params, stats, f"{dst}/bn3", state, f"{src}.7")
    return {"params": params, "batch_stats": stats}
