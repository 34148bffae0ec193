"""Generic feature-network registry tests (VERDICT r2 #5).

Covers the reference `_make_pretrained` contract
(pretrained_builder.py:118-195): every registered name builds a 4-stage
extractor, its converter accepts a fabricated state dict in the pretrained
naming, and the projected set discriminator builds from registry names —
including both reference defaults (train_setgan.py:223-240).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.models.backbones import registry

RNG = np.random.RandomState(0)


def _bn(state, prefix, c):
    state[f"{prefix}.weight"] = np.ones(c, np.float32)
    state[f"{prefix}.bias"] = np.zeros(c, np.float32)
    state[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
    state[f"{prefix}.running_var"] = np.ones(c, np.float32)


def _fake_vgg16():
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    torch_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    state, in_c = {}, 3
    for w, ti in zip(widths, torch_idx):
        state[f"features.{ti}.weight"] = \
            RNG.randn(w, in_c, 3, 3).astype(np.float32) * 0.05
        state[f"features.{ti}.bias"] = np.zeros(w, np.float32)
        in_c = w
    return state


def _fake_alexnet():
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    state = {}
    torch_idx = (0, 3, 6, 8, 10)
    for (o, i, kh, kw), ti in zip(shapes, torch_idx):
        state[f"features.{ti}.weight"] = \
            RNG.randn(o, i, kh, kw).astype(np.float32) * 0.05
        state[f"features.{ti}.bias"] = np.zeros(o, np.float32)
    return state


def _fake_resnet50():
    state = {}
    state["conv1.weight"] = RNG.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    _bn(state, "bn1", 64)
    stages = ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))
    in_c = 64
    for si, (blocks, width, out_c) in enumerate(stages, start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = \
                RNG.randn(width, in_c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn1", width)
            state[f"{t}.conv2.weight"] = \
                RNG.randn(width, width, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn2", width)
            state[f"{t}.conv3.weight"] = \
                RNG.randn(out_c, width, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn3", out_c)
            if bi == 0:
                state[f"{t}.downsample.0.weight"] = \
                    RNG.randn(out_c, in_c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{t}.downsample.1", out_c)
            in_c = out_c
    return state


def _fake_bottleneck_resnet(stages, se=False):
    """torchvision/timm bottleneck family (resnet50/101/152, wide_*,
    seresnet50) in pretrained naming."""
    state = {}
    state["conv1.weight"] = RNG.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    _bn(state, "bn1", 64)
    in_c = 64
    for si, (blocks, width, out_c, _stride) in enumerate(stages, start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = \
                RNG.randn(width, in_c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn1", width)
            state[f"{t}.conv2.weight"] = \
                RNG.randn(width, width, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn2", width)
            state[f"{t}.conv3.weight"] = \
                RNG.randn(out_c, width, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn3", out_c)
            if se:
                red = out_c // 16
                state[f"{t}.se.fc1.weight"] = \
                    RNG.randn(red, out_c, 1, 1).astype(np.float32) * 0.05
                state[f"{t}.se.fc1.bias"] = np.zeros(red, np.float32)
                state[f"{t}.se.fc2.weight"] = \
                    RNG.randn(out_c, red, 1, 1).astype(np.float32) * 0.05
                state[f"{t}.se.fc2.bias"] = np.zeros(out_c, np.float32)
            if bi == 0:
                state[f"{t}.downsample.0.weight"] = \
                    RNG.randn(out_c, in_c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{t}.downsample.1", out_c)
            in_c = out_c
    return state


def _fake_vgg19():
    widths = [64, 64, 128, 128] + [256] * 4 + [512] * 8
    torch_idx = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)
    state, in_c = {}, 3
    for w, ti in zip(widths, torch_idx):
        state[f"features.{ti}.weight"] = \
            RNG.randn(w, in_c, 3, 3).astype(np.float32) * 0.05
        state[f"features.{ti}.bias"] = np.zeros(w, np.float32)
        in_c = w
    return state


def _fake_basic_resnet(layers):
    state = {}
    state["conv1.weight"] = RNG.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    _bn(state, "bn1", 64)
    in_c = 64
    for si, (blocks, ch) in enumerate(layers, start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = \
                RNG.randn(ch, in_c, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn1", ch)
            state[f"{t}.conv2.weight"] = \
                RNG.randn(ch, ch, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn2", ch)
            if bi == 0 and si > 1:
                state[f"{t}.downsample.0.weight"] = \
                    RNG.randn(ch, in_c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{t}.downsample.1", ch)
            in_c = ch
    return state


def _fake_resnet34():
    state = {}
    state["conv1.weight"] = RNG.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    _bn(state, "bn1", 64)
    in_c = 64
    for si, (blocks, ch) in enumerate(((3, 64), (4, 128), (6, 256), (3, 512)),
                                      start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = \
                RNG.randn(ch, in_c, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn1", ch)
            state[f"{t}.conv2.weight"] = \
                RNG.randn(ch, ch, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn2", ch)
            if bi == 0 and si > 1:
                state[f"{t}.downsample.0.weight"] = \
                    RNG.randn(ch, in_c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{t}.downsample.1", ch)
            in_c = ch
    return state


def _fake_deit(d=768, prefix=2):
    state = {
        "patch_embed.proj.weight": np.zeros((d, 3, 16, 16), np.float32),
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": np.zeros((1, prefix + 14 * 14, d), np.float32),
    }
    if prefix == 2:
        state["dist_token"] = np.zeros((1, 1, d), np.float32)
    for i in range(12):
        s = f"blocks.{i}"
        state[f"{s}.norm1.weight"] = np.ones(d, np.float32)
        state[f"{s}.norm1.bias"] = np.zeros(d, np.float32)
        state[f"{s}.attn.qkv.weight"] = np.zeros((3 * d, d), np.float32)
        state[f"{s}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
        state[f"{s}.attn.proj.weight"] = np.zeros((d, d), np.float32)
        state[f"{s}.attn.proj.bias"] = np.zeros(d, np.float32)
        state[f"{s}.norm2.weight"] = np.ones(d, np.float32)
        state[f"{s}.norm2.bias"] = np.zeros(d, np.float32)
        state[f"{s}.mlp.fc1.weight"] = np.zeros((4 * d, d), np.float32)
        state[f"{s}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        state[f"{s}.mlp.fc2.weight"] = np.zeros((d, 4 * d), np.float32)
        state[f"{s}.mlp.fc2.bias"] = np.zeros(d, np.float32)
    return state


def _fake_efficientnet(se=False, stages=None, stem=32):
    if stages is None:
        from stylegan3_editing_tpu.models.backbones.efficientnet import _STAGES
        stages = _STAGES
    state = {"conv_stem.weight": np.zeros((stem, 3, 3, 3), np.float32)}
    _bn(state, "bn1", stem)
    in_c = stem
    for si, (blocks, k, stride, exp, out) in enumerate(stages):
        for bi in range(blocks):
            s = f"blocks.{si}.{bi}"
            if se:
                red = max(1, int(in_c * 0.25))
                mid = in_c * exp
                state[f"{s}.se.conv_reduce.weight"] = \
                    np.zeros((red, mid, 1, 1), np.float32)
                state[f"{s}.se.conv_reduce.bias"] = np.zeros(red, np.float32)
                state[f"{s}.se.conv_expand.weight"] = \
                    np.zeros((mid, red, 1, 1), np.float32)
                state[f"{s}.se.conv_expand.bias"] = np.zeros(mid, np.float32)
            if exp == 1:
                state[f"{s}.conv_dw.weight"] = \
                    np.zeros((in_c, 1, k, k), np.float32)
                _bn(state, f"{s}.bn1", in_c)
                state[f"{s}.conv_pw.weight"] = \
                    np.zeros((out, in_c, 1, 1), np.float32)
                _bn(state, f"{s}.bn2", out)
            else:
                mid = in_c * exp
                state[f"{s}.conv_pw.weight"] = \
                    np.zeros((mid, in_c, 1, 1), np.float32)
                _bn(state, f"{s}.bn1", mid)
                state[f"{s}.conv_dw.weight"] = \
                    np.zeros((mid, 1, k, k), np.float32)
                _bn(state, f"{s}.bn2", mid)
                state[f"{s}.conv_pwl.weight"] = \
                    np.zeros((out, mid, 1, 1), np.float32)
                _bn(state, f"{s}.bn3", out)
            in_c = out
    return state


def _fake_clip():
    d = 768
    state = {
        "visual.conv1.weight": np.zeros((d, 3, 32, 32), np.float32),
        "visual.class_embedding": np.zeros(d, np.float32),
        "visual.positional_embedding": np.zeros((7 * 7 + 1, d), np.float32),
        "visual.ln_pre.weight": np.ones(d, np.float32),
        "visual.ln_pre.bias": np.zeros(d, np.float32),
    }
    for i in range(12):
        s = f"visual.transformer.resblocks.{i}"
        state[f"{s}.attn.in_proj_weight"] = np.zeros((3 * d, d), np.float32)
        state[f"{s}.attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
        state[f"{s}.attn.out_proj.weight"] = np.zeros((d, d), np.float32)
        state[f"{s}.attn.out_proj.bias"] = np.zeros(d, np.float32)
        state[f"{s}.ln_1.weight"] = np.ones(d, np.float32)
        state[f"{s}.ln_1.bias"] = np.zeros(d, np.float32)
        state[f"{s}.ln_2.weight"] = np.ones(d, np.float32)
        state[f"{s}.ln_2.bias"] = np.zeros(d, np.float32)
        state[f"{s}.mlp.c_fc.weight"] = np.zeros((4 * d, d), np.float32)
        state[f"{s}.mlp.c_fc.bias"] = np.zeros(4 * d, np.float32)
        state[f"{s}.mlp.c_proj.weight"] = np.zeros((d, 4 * d), np.float32)
        state[f"{s}.mlp.c_proj.bias"] = np.zeros(d, np.float32)
    return state


def _efficientnet_fabricators():
    from stylegan3_editing_tpu.models.backbones.efficientnet import (
        efficientnet_family)
    fabs = {}
    for name in ("tf_efficientnet_b1", "tf_efficientnet_b2",
                 "tf_efficientnet_b3", "tf_efficientnet_b4",
                 "tf_efficientnet_b0_ns", "tf_efficientnet_lite1",
                 "tf_efficientnet_lite2", "tf_efficientnet_lite3",
                 "tf_efficientnet_lite4"):
        stages, stem, se, _act = efficientnet_family(name)
        fabs[name] = (lambda _st=stages, _sm=stem, _se=se:
                      _fake_efficientnet(se=_se, stages=_st, stem=_sm))
    fabs["efficientnet_b1"] = fabs["tf_efficientnet_b1"]
    return fabs


def _bottleneck_fabricators():
    from stylegan3_editing_tpu.models.backbones.resnet import BOTTLENECK_STAGES
    fabs = {
        name: (lambda _s=stages, _e=name.startswith("seresnet"):
               _fake_bottleneck_resnet(_s, se=_e))
        for name, stages in BOTTLENECK_STAGES.items() if name != "resnet50"
    }
    for name, base in (("resnet26d", "resnet26"), ("resnet50d", "resnet50")):
        fabs[name] = (lambda _s=BOTTLENECK_STAGES[base]: _fake_d_resnet(_s))
    return fabs


def _fake_d_resnet(stages):
    """timm resnet26d/50d naming: deep conv1.{0,3,6} stem, downsample.{1,2}."""
    state = {}
    in_c = 3
    for src, w in ((0, 32), (3, 32), (6, 64)):
        state[f"conv1.{src}.weight"] = \
            RNG.randn(w, in_c, 3, 3).astype(np.float32) * 0.05
        if src < 6:
            _bn(state, f"conv1.{src + 1}", w)
        in_c = w
    _bn(state, "bn1", 64)
    for si, (blocks, width, out_c, _stride) in enumerate(stages, start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = \
                RNG.randn(width, in_c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn1", width)
            state[f"{t}.conv2.weight"] = \
                RNG.randn(width, width, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn2", width)
            state[f"{t}.conv3.weight"] = \
                RNG.randn(out_c, width, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn3", out_c)
            if bi == 0:
                state[f"{t}.downsample.1.weight"] = \
                    RNG.randn(out_c, in_c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{t}.downsample.2", out_c)
            in_c = out_c
    return state


def _fake_clip_resnet():
    state = {}
    widths = (32, 32, 64)
    in_c = 3
    for i, w in enumerate(widths, start=1):
        state[f"visual.conv{i}.weight"] = \
            RNG.randn(w, in_c, 3, 3).astype(np.float32) * 0.05
        _bn(state, f"visual.bn{i}", w)
        in_c = w
    c = 64
    for li, n in enumerate((3, 4, 6, 3), start=1):
        planes = 64 * (2 ** (li - 1))
        out_c = planes * 4
        for bi in range(n):
            t = f"visual.layer{li}.{bi}"
            state[f"{t}.conv1.weight"] = \
                RNG.randn(planes, c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn1", planes)
            state[f"{t}.conv2.weight"] = \
                RNG.randn(planes, planes, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn2", planes)
            state[f"{t}.conv3.weight"] = \
                RNG.randn(out_c, planes, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{t}.bn3", out_c)
            if bi == 0:
                state[f"{t}.downsample.0.weight"] = \
                    RNG.randn(out_c, c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{t}.downsample.1", out_c)
            c = out_c
    return state


def _fake_regnet(name):
    from stylegan3_editing_tpu.models.backbones.regnet import regnet_stages
    se = name.startswith("regnety")
    state = {"stem.conv.weight":
             RNG.randn(32, 3, 3, 3).astype(np.float32) * 0.05}
    _bn(state, "stem.bn", 32)
    c = 32
    for si, (d, w, groups) in enumerate(regnet_stages(name), start=1):
        for bi in range(1, d + 1):
            src = f"s{si}.b{bi}"
            state[f"{src}.conv1.conv.weight"] = \
                RNG.randn(w, c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.conv1.bn", w)
            state[f"{src}.conv2.conv.weight"] = \
                RNG.randn(w, w // groups, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{src}.conv2.bn", w)
            if se:
                red = int(round(c * 0.25))
                state[f"{src}.se.fc1.weight"] = \
                    RNG.randn(red, w, 1, 1).astype(np.float32) * 0.05
                state[f"{src}.se.fc1.bias"] = np.zeros(red, np.float32)
                state[f"{src}.se.fc2.weight"] = \
                    RNG.randn(w, red, 1, 1).astype(np.float32) * 0.05
                state[f"{src}.se.fc2.bias"] = np.zeros(w, np.float32)
            state[f"{src}.conv3.conv.weight"] = \
                RNG.randn(w, w, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.conv3.bn", w)
            if bi == 1:
                state[f"{src}.downsample.conv.weight"] = \
                    RNG.randn(w, c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{src}.downsample.bn", w)
            c = w
    return state


def _fake_vgg_bn(name):
    from stylegan3_editing_tpu.models.backbones.vgg import VGG_FAMILIES
    stages, _bn_flag = VGG_FAMILIES[name]
    state = {}
    theirs = 0
    in_c = 3
    for stage_i, widths in enumerate(stages):
        if stage_i > 0:
            theirs += 1  # MaxPool2d
        for w in widths:
            state[f"features.{theirs}.weight"] = \
                RNG.randn(w, in_c, 3, 3).astype(np.float32) * 0.05
            state[f"features.{theirs}.bias"] = np.zeros(w, np.float32)
            _bn(state, f"features.{theirs + 1}", w)
            in_c = w
            theirs += 3  # Conv2d + BatchNorm2d + ReLU
    return state


def _fake_densenet(blocks):
    state = {"features.conv0.weight":
             RNG.randn(64, 3, 7, 7).astype(np.float32) * 0.05}
    _bn(state, "features.norm0", 64)
    c = 64
    for bi, n in enumerate(blocks):
        for li in range(n):
            s = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            _bn(state, f"{s}.norm1", c)
            state[f"{s}.conv1.weight"] = \
                RNG.randn(128, c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{s}.norm2", 128)
            state[f"{s}.conv2.weight"] = \
                RNG.randn(32, 128, 3, 3).astype(np.float32) * 0.05
            c += 32
        if bi < 3:
            _bn(state, f"features.transition{bi + 1}.norm", c)
            state[f"features.transition{bi + 1}.conv.weight"] = \
                RNG.randn(c // 2, c, 1, 1).astype(np.float32) * 0.05
            c //= 2
        else:
            _bn(state, "features.norm5", c)
    return state


def _fake_mobilenet_v2():
    from stylegan3_editing_tpu.models.backbones.mobilenet import MBV2_BLOCKS
    state = {"features.0.0.weight":
             RNG.randn(32, 3, 3, 3).astype(np.float32) * 0.05}
    _bn(state, "features.0.1", 32)
    c = 32
    for bi, (t, out, _s) in enumerate(MBV2_BLOCKS, start=1):
        src = f"features.{bi}.conv"
        mid = c * t
        if t == 1:
            state[f"{src}.0.0.weight"] = \
                RNG.randn(mid, 1, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{src}.0.1", mid)
            state[f"{src}.1.weight"] = \
                RNG.randn(out, mid, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.2", out)
        else:
            state[f"{src}.0.0.weight"] = \
                RNG.randn(mid, c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.0.1", mid)
            state[f"{src}.1.0.weight"] = \
                RNG.randn(mid, 1, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{src}.1.1", mid)
            state[f"{src}.2.weight"] = \
                RNG.randn(out, mid, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.3", out)
        c = out
    return state


def _fake_mnasnet(alpha):
    from stylegan3_editing_tpu.models.backbones.mobilenet import (
        MNASNET_STACKS, mnasnet_channels)
    (c_stem, c_sep), outs = mnasnet_channels(alpha)
    state = {"layers.0.weight":
             RNG.randn(c_stem, 3, 3, 3).astype(np.float32) * 0.05}
    _bn(state, "layers.1", c_stem)
    state["layers.3.weight"] = \
        RNG.randn(c_stem, 1, 3, 3).astype(np.float32) * 0.05
    _bn(state, "layers.4", c_stem)
    state["layers.6.weight"] = \
        RNG.randn(c_sep, c_stem, 1, 1).astype(np.float32) * 0.05
    _bn(state, "layers.7", c_sep)
    c = c_sep
    for si, ((k, _s, t, _bc, n), out) in enumerate(zip(MNASNET_STACKS, outs)):
        for bi in range(n):
            src = f"layers.{8 + si}.{bi}.layers"
            mid = c * t
            state[f"{src}.0.weight"] = \
                RNG.randn(mid, c, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.1", mid)
            state[f"{src}.3.weight"] = \
                RNG.randn(mid, 1, k, k).astype(np.float32) * 0.05
            _bn(state, f"{src}.4", mid)
            state[f"{src}.6.weight"] = \
                RNG.randn(out, mid, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.7", out)
            c = out
    return state


def _fake_shufflenet():
    from stylegan3_editing_tpu.models.backbones.shufflenet import (
        SHUFFLENET_V2_X0_5)
    state = {"conv1.0.weight":
             RNG.randn(24, 3, 3, 3).astype(np.float32) * 0.05}
    _bn(state, "conv1.1", 24)
    c = 24
    for si, (reps, out) in enumerate(SHUFFLENET_V2_X0_5, start=2):
        half = out // 2
        for bi in range(reps):
            src = f"stage{si}.{bi}"
            if bi == 0:
                state[f"{src}.branch1.0.weight"] = \
                    RNG.randn(c, 1, 3, 3).astype(np.float32) * 0.05
                _bn(state, f"{src}.branch1.1", c)
                state[f"{src}.branch1.2.weight"] = \
                    RNG.randn(half, c, 1, 1).astype(np.float32) * 0.05
                _bn(state, f"{src}.branch1.3", half)
                b2_in = c
            else:
                b2_in = half
            state[f"{src}.branch2.0.weight"] = \
                RNG.randn(half, b2_in, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.branch2.1", half)
            state[f"{src}.branch2.3.weight"] = \
                RNG.randn(half, 1, 3, 3).astype(np.float32) * 0.05
            _bn(state, f"{src}.branch2.4", half)
            state[f"{src}.branch2.5.weight"] = \
                RNG.randn(half, half, 1, 1).astype(np.float32) * 0.05
            _bn(state, f"{src}.branch2.6", half)
        c = out
    return state


_FABRICATORS = {
    "vgg16": _fake_vgg16,
    "vgg19": _fake_vgg19,
    "alexnet": _fake_alexnet,
    "resnet50": _fake_resnet50,
    "resnet34": _fake_resnet34,
    "resnet18": lambda: _fake_basic_resnet(
        ((2, 64), (2, 128), (2, 256), (2, 512))),
    "deit_base_distilled_patch16_224": _fake_deit,
    "deit_small_distilled_patch16_224": lambda: _fake_deit(d=384),
    "deit_tiny_distilled_patch16_224": lambda: _fake_deit(d=192),
    "vit_base_patch16_224": lambda: _fake_deit(prefix=1),
    "tf_efficientnet_lite0": _fake_efficientnet,
    "tf_efficientnet_b0": lambda: _fake_efficientnet(se=True),
    "clip_vit_b32": _fake_clip,
    "resnet50_clip": _fake_clip_resnet,
    "densenet121": lambda: _fake_densenet((6, 12, 24, 16)),
    "densenet169": lambda: _fake_densenet((6, 12, 32, 32)),
    "densenet201": lambda: _fake_densenet((6, 12, 48, 32)),
    "mobilenet_v2": _fake_mobilenet_v2,
    "mnasnet0_5": lambda: _fake_mnasnet(0.5),
    "mnasnet1_0": lambda: _fake_mnasnet(1.0),
    "shufflenet_v2_x0_5": _fake_shufflenet,
    "vgg11_bn": lambda: _fake_vgg_bn("vgg11_bn"),
    "vgg13_bn": lambda: _fake_vgg_bn("vgg13_bn"),
    "vgg16_bn": lambda: _fake_vgg_bn("vgg16_bn"),
    "vgg19_bn": lambda: _fake_vgg_bn("vgg19_bn"),
}
_FABRICATORS.update(_bottleneck_fabricators())
_FABRICATORS.update(_efficientnet_fabricators())


def _regnet_fabricators():
    from stylegan3_editing_tpu.models.backbones.regnet import REGNET_PARAMS
    return {name: (lambda _n=name: _fake_regnet(_n)) for name in REGNET_PARAMS}


_FABRICATORS.update(_regnet_fabricators())


def test_registry_has_reference_defaults():
    names = registry.available()
    assert "deit_base_distilled_patch16_224" in names
    assert "tf_efficientnet_lite0" in names
    assert len(names) >= 6


@pytest.mark.parametrize("name", sorted(_FABRICATORS))
def test_feature_network_four_stages_and_converter(name):
    """Build → forward gives 4 maps with the spec's channels; converter
    accepts the pretrained naming and the converted variables apply."""
    module, spec = registry.make_feature_network(name)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    feats = module.apply(variables, x)
    assert len(feats) == 4
    assert tuple(f.shape[-1] for f in feats) == spec.channels

    converted = registry.convert_feature_network_state(
        name, _FABRICATORS[name]())
    # Merge converted over the init tree (stage heads may stay random).
    import flax
    merged = flax.core.unfreeze(variables)

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                assert k in dst, f"converter produced unknown param {k}"
                assert np.shape(dst[k]) == np.shape(v), (
                    name, k, np.shape(dst[k]), np.shape(v))
                dst[k] = v

    deep_update(merged, converted)
    feats2 = module.apply(merged, x)
    assert len(feats2) == 4


@pytest.mark.slow
def test_discriminator_builds_from_registry_names():
    """ProjectedSetDiscriminator builds from registry names incl. both
    reference defaults (train_setgan.py:223-240)."""
    from stylegan3_editing_tpu.setgan.discriminator import (
        ProjectedSetDiscriminator)

    for names in (("deit_base_distilled_patch16_224",),
                  ("tf_efficientnet_lite0",),
                  ("resnet34",)):
        d = ProjectedSetDiscriminator(backbones=names, interp224=False)
        r = jnp.zeros((1, 2, 64, 64, 3))
        x = jnp.zeros((1, 1, 64, 64, 3))
        v = d.init(jax.random.PRNGKey(0), r, x)
        logits = d.apply(v, r, x, rngs={"aug": jax.random.PRNGKey(1)})
        assert logits.ndim == 2 and logits.shape[0] == 1


def test_vit_families_declare_fixed_input_res():
    """ViT backbones must be resized to their baked-in token grid even when
    interp224 is off (reference `self.interp224 or bb_name in VITS`,
    models/setgan/discriminator.py:225-227); conv families must not."""
    from stylegan3_editing_tpu.setgan.discriminator import backbone_fixed_res

    for name in ("deit_base_distilled_patch16_224",
                 "deit_small_distilled_patch16_224",
                 "deit_tiny_distilled_patch16_224",
                 "vit_base_patch16_224", "clip_vit_b32"):
        assert backbone_fixed_res(name) == 224, name
    for name in ("tf_efficientnet_lite0", "vgg16", "resnet50",
                 "vgg16_proj", "resnet50_clip"):
        assert backbone_fixed_res(name) is None, name
