"""EfficientNet-lite0 feature extractor (flax NHWC) for the projected D.

Parity: timm `tf_efficientnet_lite0` as sliced by the reference's
`_make_efficientnet` (/root/reference/models/styleganxl/feature_networks/
pretrained_builder.py:118-126): layer0 = stem + blocks[0:2] (24ch @ /4),
layer1 = blocks[2] (40 @ /8), layer2 = blocks[3:5] (112 @ /16),
layer3 = blocks[5:] (320 @ /32). Lite variants: ReLU6, no squeeze-excite,
fixed stem width 32. `tf_` = TensorFlow asymmetric SAME padding, which is
exactly jax's "SAME".

`convert_efficientnet_lite0` maps a timm state dict
(`conv_stem.weight`, `blocks.3.1.conv_pwl.weight`, …) onto the module.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm, bn_from_torch, conv_w, put

# Per-stage (num_blocks, kernel, stride, expand_ratio, out_channels); b0/lite0.
_STAGES = (
    (1, 3, 1, 1, 16),
    (2, 3, 2, 6, 24),
    (2, 5, 2, 6, 40),
    (3, 3, 2, 6, 80),
    (3, 5, 1, 6, 112),
    (4, 5, 2, 6, 192),
    (1, 3, 1, 6, 320),
)
# Stage index ranges per feature level (reference pretrained_builder.py:120-126).
_LEVELS = ((0, 2), (2, 3), (3, 5), (5, 7))


def _round_channels(c: float, mult: float) -> int:
    """timm `round_channels` (divisor 8) — EfficientNet width scaling."""
    v = c * mult
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


def scaled_stages(width_mult: float = 1.0, depth_mult: float = 1.0,
                  fix_first_last: bool = False):
    """Compound-scale the b0/lite0 stage table (timm decode_arch_def:
    per-stage `ceil(blocks · depth_mult)`, `round_channels(c · width_mult)`;
    the lite family pins the first/last stages' depth)."""
    import math
    out = []
    last = len(_STAGES) - 1
    for si, (blocks, k, s, e, c) in enumerate(_STAGES):
        if not (fix_first_last and si in (0, last)):
            blocks = int(math.ceil(blocks * depth_mult))
        out.append((blocks, k, s, e, _round_channels(c, width_mult)))
    return tuple(out)


# name → (width_mult, depth_mult). Same compound-scaling ladder for the b
# and lite families (timm efficientnet.py; reference EFFNETS lists,
# constants.py:67-91). b-series scales the 32ch stem too; lite pins it.
EFFICIENTNET_SCALING = {
    0: (1.0, 1.0), 1: (1.0, 1.1), 2: (1.1, 1.2), 3: (1.2, 1.4), 4: (1.4, 1.8),
}


def efficientnet_family(name: str):
    """'tf_efficientnet_b3' / 'tf_efficientnet_lite2' / 'tf_efficientnet_b0_ns'
    → (stages, stem_channels, se, act). `_ns` (noisy-student weights) shares
    the base architecture."""
    base = name.replace("_ns", "")
    kind, idx = base.rsplit("_", 1)  # 'tf_efficientnet', 'b3' | 'lite2'
    lite = idx.startswith("lite")
    n = int(idx[4:] if lite else idx[1:])
    w, d = EFFICIENTNET_SCALING[n]
    if lite:
        return (scaled_stages(w, d, fix_first_last=True), 32, False, "relu6")
    return (scaled_stages(w, d), _round_channels(32, w), True, "silu")

_relu6 = lambda v: jnp.minimum(jax.nn.relu(v), 6.0)
_ACTS = {"relu6": _relu6, "silu": jax.nn.silu}


def _bn_eps():
    # TF EfficientNet BatchNorm epsilon.
    return BatchNorm(epsilon=1e-3)


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite: pooled → conv_reduce → act → conv_expand → gate."""

    reduced: int
    act: str = "silu"

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="conv_reduce")(s)
        s = _ACTS[self.act](s)
        s = nn.Conv(x.shape[-1], (1, 1), name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class DepthwiseSeparable(nn.Module):
    """Stage-0 block: dw conv (+SE) + pw linear projection (timm DS block)."""

    out: int
    kernel: int
    stride: int
    se_reduced: int = 0  # 0 = no SE (lite variants)
    act: str = "relu6"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        act = _ACTS[self.act]
        y = nn.Conv(c, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", feature_group_count=c, use_bias=False,
                    name="conv_dw")(x)
        y = BatchNorm(epsilon=1e-3, name="bn1")(y)
        y = act(y)
        if self.se_reduced:
            y = SqueezeExcite(self.se_reduced, self.act, name="se")(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="conv_pw")(y)
        y = BatchNorm(epsilon=1e-3, name="bn2")(y)
        if self.stride == 1 and c == self.out:
            y = y + x
        return y


class InvertedResidual(nn.Module):
    """MBConv: pw expand → dw (+SE) → pw linear (+residual); SE off for
    the lite variants."""

    out: int
    kernel: int
    stride: int
    expand: int
    se_reduced: int = 0
    act: str = "relu6"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = c * self.expand
        act = _ACTS[self.act]
        y = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        y = BatchNorm(epsilon=1e-3, name="bn1")(y)
        y = act(y)
        y = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    name="conv_dw")(y)
        y = BatchNorm(epsilon=1e-3, name="bn2")(y)
        y = act(y)
        if self.se_reduced:
            y = SqueezeExcite(self.se_reduced, self.act, name="se")(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="conv_pwl")(y)
        y = BatchNorm(epsilon=1e-3, name="bn3")(y)
        if self.stride == 1 and c == self.out:
            y = y + x
        return y


class EfficientNetFeatures(nn.Module):
    """NHWC input → 4 feature maps (/4 24ch, /8 40ch, /16 112ch, /32 320ch).

    `se` + `act='silu'` select the full B0 (timm `tf_efficientnet_b0`, SE
    ratio 0.25 of block input, reference EFFNETS_IMAGENET); the lite0
    default has no SE and ReLU6."""

    se: bool = False
    act: str = "relu6"
    stages: tuple = _STAGES
    stem: int = 32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        act = _ACTS[self.act]
        x = nn.Conv(self.stem, (3, 3), strides=2, padding="SAME",
                    use_bias=False, name="conv_stem")(x)
        x = BatchNorm(epsilon=1e-3, name="bn1")(x)
        x = act(x)
        outs = []
        in_c = self.stem
        for level, (s0, s1) in enumerate(_LEVELS):
            for si in range(s0, s1):
                blocks, k, stride, exp, out = self.stages[si]
                for bi in range(blocks):
                    cls = DepthwiseSeparable if exp == 1 else InvertedResidual
                    se_red = max(1, int(in_c * 0.25)) if self.se else 0
                    kwargs = dict(out=out, kernel=k,
                                  stride=stride if bi == 0 else 1,
                                  se_reduced=se_red, act=self.act)
                    if exp != 1:
                        kwargs["expand"] = exp
                    x = cls(name=f"blocks_{si}_{bi}", **kwargs)(x)
                    in_c = out
            outs.append(x)
        return outs


def EfficientNetLite0Features(**kw):
    return EfficientNetFeatures(se=False, act="relu6", **kw)


def EfficientNetB0Features(**kw):
    return EfficientNetFeatures(se=True, act="silu", **kw)


def _convert_efficientnet_state(state: Mapping[str, np.ndarray],
                                se: bool, stages=_STAGES) -> dict:
    params: Dict = {}
    stats: Dict = {}
    put(params, "conv_stem/kernel", conv_w(state["conv_stem.weight"]))
    bn_from_torch(params, stats, "bn1", state, "bn1")
    for si, (blocks, k, stride, exp, out) in enumerate(stages):
        for bi in range(blocks):
            src = f"blocks.{si}.{bi}"
            dst = f"blocks_{si}_{bi}"

            def dw(t):  # torch depthwise [C,1,kh,kw] → HWIO [kh,kw,1,C]
                return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))

            if exp == 1:
                put(params, f"{dst}/conv_dw/kernel", dw(state[f"{src}.conv_dw.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn1", state, f"{src}.bn1")
                put(params, f"{dst}/conv_pw/kernel", conv_w(state[f"{src}.conv_pw.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn2", state, f"{src}.bn2")
            else:
                put(params, f"{dst}/conv_pw/kernel", conv_w(state[f"{src}.conv_pw.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn1", state, f"{src}.bn1")
                put(params, f"{dst}/conv_dw/kernel", dw(state[f"{src}.conv_dw.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn2", state, f"{src}.bn2")
                put(params, f"{dst}/conv_pwl/kernel", conv_w(state[f"{src}.conv_pwl.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn3", state, f"{src}.bn3")
            if se:
                for tt, oo in (("conv_reduce", "conv_reduce"),
                               ("conv_expand", "conv_expand")):
                    put(params, f"{dst}/se/{oo}/kernel",
                        conv_w(state[f"{src}.se.{tt}.weight"]))
                    put(params, f"{dst}/se/{oo}/bias",
                        state[f"{src}.se.{tt}.bias"])
    return {"params": params, "batch_stats": stats}


def convert_efficientnet_lite0(state: Mapping[str, np.ndarray]) -> dict:
    """timm `tf_efficientnet_lite0` state dict → module variables."""
    return _convert_efficientnet_state(state, se=False)


def convert_efficientnet_b0(state: Mapping[str, np.ndarray]) -> dict:
    """timm `tf_efficientnet_b0` state dict → module variables."""
    return _convert_efficientnet_state(state, se=True)


def make_efficientnet(name: str):
    """Any `tf_efficientnet_{b0..b4,b0_ns,lite0..lite4}` → (module factory,
    converter, 4-stage channels). Reference EFFNETS families
    (pretrained_builder.py:394-396, constants.py:67-91)."""
    stages, stem, se, act = efficientnet_family(name)
    channels = tuple(stages[s1 - 1][4] for _, s1 in _LEVELS)

    def make(**kw):
        return EfficientNetFeatures(se=se, act=act, stages=stages, stem=stem,
                                    **kw)

    def convert(state):
        return _convert_efficientnet_state(state, se=se, stages=stages)

    return make, convert, channels
