"""RegNetX / RegNetY feature extractors (flax NHWC) for the projected D.

Parity: timm `regnetx_002..064` / `regnety_002..064` sliced by the
reference's `_make_regnet` (/root/reference/models/styleganxl/
feature_networks/pretrained_builder.py:32-40, 390-392): layer0 = stem + s1
(/4), layer1-3 = s2/s3/s4 (/8 /16 /32). Stage widths/depths come from the
deterministic RegNet generation rule ("Designing Network Design Spaces",
Radosavovic et al., Table: w(i) = w0 + wa·i quantized to powers of wm,
rounded to multiples of 8, then group-width-adjusted) — the same rule timm
evaluates at model-build time, so converted timm state dicts line up
shape-for-shape. RegNetY adds an SE block (reduction vs the block INPUT
width) between the group conv and the projection.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import BatchNorm, bn_from_torch, conv_w, put

# name → (depth, w0, wa, wm, group_size); se_ratio 0.25 for the y-series.
# Constants from the paper's final RegNetX/RegNetY table (timm model args).
REGNET_PARAMS = {
    "regnetx_002": (13, 24, 36.44, 2.49, 8),
    "regnetx_004": (22, 24, 24.48, 2.54, 16),
    "regnetx_006": (16, 48, 36.97, 2.24, 24),
    "regnetx_008": (16, 56, 35.73, 2.28, 16),
    "regnetx_016": (18, 80, 34.01, 2.25, 24),
    "regnetx_032": (25, 88, 26.31, 2.25, 48),
    "regnetx_040": (23, 96, 38.65, 2.43, 40),
    "regnetx_064": (17, 184, 60.83, 2.07, 56),
    "regnety_002": (13, 24, 36.44, 2.49, 8),
    "regnety_004": (16, 48, 27.89, 2.09, 8),
    "regnety_006": (15, 48, 32.54, 2.32, 16),
    "regnety_008": (14, 56, 38.84, 2.4, 16),
    "regnety_016": (27, 48, 20.71, 2.65, 24),
    "regnety_032": (21, 80, 42.63, 2.66, 24),
    "regnety_040": (22, 96, 31.41, 2.24, 64),
    "regnety_064": (25, 112, 33.22, 2.27, 72),
}
_STEM = 32


def regnet_stages(name: str) -> Tuple[Tuple[int, int, int], ...]:
    """name → per-stage (depth, width, groups), group-width adjusted.

    Reproduces timm's `generate_regnet` + `adjust_widths_groups_comp`
    (bottle_ratio 1).
    """
    depth, w0, wa, wm, g = REGNET_PARAMS[name]
    cont = np.arange(depth) * wa + w0
    exps = np.round(np.log(cont / w0) / np.log(wm))
    widths = (np.round(w0 * np.power(wm, exps) / 8) * 8).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    out = []
    for w, d in zip(stage_widths.tolist(), stage_depths.tolist()):
        gw = min(g, w)
        w = int(round(w / gw) * gw)  # quantize width to the group width
        out.append((int(d), int(w), w // gw))
    assert len(out) == 4, f"{name}: expected 4 stages, got {len(out)}"
    return tuple(out)


class RegNetBlock(nn.Module):
    """timm regnet Bottleneck: 1×1 → 3×3 group conv (stride) [→ SE] → 1×1,
    BN after each conv, ReLU, residual with conv+BN downsample."""

    width: int
    stride: int
    groups: int
    se: bool

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(BatchNorm(name="bn1")(y))
        y = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.groups, use_bias=False,
                    name="conv2")(y)
        y = nn.relu(BatchNorm(name="bn2")(y))
        if self.se:
            red = int(round(c_in * 0.25))  # vs block INPUT width (timm)
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(red, (1, 1), name="se_fc1")(s))
            s = jax.nn.sigmoid(nn.Conv(self.width, (1, 1), name="se_fc2")(s))
            y = y * s
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y)
        if self.stride != 1 or c_in != self.width:
            x = nn.Conv(self.width, (1, 1), strides=self.stride,
                        use_bias=False, name="down_conv")(x)
            x = BatchNorm(name="down_bn")(x)
        return nn.relu(y + x)


class RegNetStages(nn.Module):
    """NHWC input → 4 feature maps at /4 /8 /16 /32 (stem+s1, s2, s3, s4)."""

    name: str = "regnety_016"

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        se = self.name.startswith("regnety")
        x = nn.Conv(_STEM, (3, 3), strides=2, padding=1, use_bias=False,
                    name="stem_conv")(x)
        x = nn.relu(BatchNorm(name="stem_bn")(x))
        outs = []
        for si, (d, w, groups) in enumerate(regnet_stages(self.name), start=1):
            for bi in range(1, d + 1):
                x = RegNetBlock(w, 2 if bi == 1 else 1, groups, se,
                                name=f"s{si}_b{bi}")(x)
            outs.append(x)
        return outs


def convert_regnet_state(state: Mapping[str, np.ndarray], name: str) -> dict:
    """timm regnet state dict (stem.conv / sN.bM.convK.conv ...) → variables."""
    params: Dict = {}
    stats: Dict = {}
    put(params, "stem_conv/kernel", conv_w(state["stem.conv.weight"]))
    bn_from_torch(params, stats, "stem_bn", state, "stem.bn")
    se = name.startswith("regnety")
    for si, (d, _w, _g) in enumerate(regnet_stages(name), start=1):
        for bi in range(1, d + 1):
            src = f"s{si}.b{bi}"
            dst = f"s{si}_b{bi}"
            for k in (1, 2, 3):
                put(params, f"{dst}/conv{k}/kernel",
                    conv_w(state[f"{src}.conv{k}.conv.weight"]))
                bn_from_torch(params, stats, f"{dst}/bn{k}", state,
                              f"{src}.conv{k}.bn")
            if se:
                put(params, f"{dst}/se_fc1/kernel",
                    conv_w(state[f"{src}.se.fc1.weight"]))
                put(params, f"{dst}/se_fc1/bias", state[f"{src}.se.fc1.bias"])
                put(params, f"{dst}/se_fc2/kernel",
                    conv_w(state[f"{src}.se.fc2.weight"]))
                put(params, f"{dst}/se_fc2/bias", state[f"{src}.se.fc2.bias"])
            if f"{src}.downsample.conv.weight" in state:
                put(params, f"{dst}/down_conv/kernel",
                    conv_w(state[f"{src}.downsample.conv.weight"]))
                bn_from_torch(params, stats, f"{dst}/down_bn", state,
                              f"{src}.downsample.bn")
    return {"params": params, "batch_stats": stats}


def make_regnet(name: str):
    """'regnet[xy]_NNN' → (module factory, converter, 4-stage channels)."""

    def make(**kw):
        return RegNetStages(name=name, **kw)

    def convert(st):
        return convert_regnet_state(st, name)

    channels = tuple(w for (_d, w, _g) in regnet_stages(name))
    return make, convert, channels
