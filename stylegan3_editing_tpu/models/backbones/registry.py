"""Generic feature-network registry: name → 4-stage extractor + converter.

TPU-native counterpart of the reference's `_make_pretrained` builder, which
slices ~30 timm families into 4 feature stages for the projected
discriminator (/root/reference/models/styleganxl/feature_networks/
pretrained_builder.py:118-195) with per-backbone normalization constants
(constants.py:67-104, projector.py:9-28).

Every entry provides:
- ``make()``      → a flax module whose ``__call__(x_nhwc)`` returns a list
                    of 4 feature maps (the /4, /8, /16, /32 stage contract);
- ``mean/std``    → input normalization (applied by the caller on [0,1] RGB);
- ``convert``     → torch/timm state dict → flax variables (pretrained
                    weights); stage-projection heads that the reference
                    leaves randomly initialized stay randomly initialized.

New families register with one ``register(...)`` call. The projected set
discriminator resolves ``--backbones`` names through this registry
(setgan/discriminator.py), so any registered name is trainable-against.

Coverage vs the reference's ALL_MODELS (constants.py:110): every VGG/BN-VGG,
DenseNet, ResNet depth/width/SE, shufflenet/mobilenet/mnasnet, the full
RegNetX/Y ladder, EfficientNet b0-b4/ns/lite0-4, DeiT tiny/small/base,
vit_base, CLIP ViT + RN50, resnet26d/50d deep-stem variants — ~68 names.
Not ported (each is one ``register()`` away; the reference builder cannot
construct `inception_v3`/`revnet` at all): ghostnet/cspresnet/fbnetc/
spnasnet/mixnet/vovnet/res2next/gernet/repvgg/nfnet one-offs,
efficientnetv2 + pruned variants, resnetblur50/resnetrs50.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
INCEPTION_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
INCEPTION_STD = np.array([0.5, 0.5, 0.5], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class SlicedStages(nn.Module):
    """Adapter: run an inner multi-stage module, keep 4 selected stages."""

    inner: Callable[..., nn.Module]
    take: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x) -> List:
        feats = self.inner(name="net")(x)
        return [feats[i] for i in self.take]


@dataclasses.dataclass(frozen=True)
class FeatureNetworkSpec:
    name: str
    make: Callable[[], nn.Module]
    mean: np.ndarray
    std: np.ndarray
    convert: Optional[Callable[[Mapping[str, np.ndarray]], dict]]
    channels: Tuple[int, int, int, int]
    # True when `convert` output nests under a "net" child (SlicedStages).
    nested: bool = False
    # ViT families take a fixed input size (their token grid is baked into
    # the positional embedding); the discriminator resizes inputs to this
    # even when interp224 is off — reference `self.interp224 or bb_name in
    # VITS` (models/setgan/discriminator.py:225-227).
    fixed_input_res: Optional[int] = None


_REGISTRY: Dict[str, FeatureNetworkSpec] = {}


def register(name: str, make, mean, std, convert, channels,
             nested: bool = False,
             fixed_input_res: Optional[int] = None) -> None:
    _REGISTRY[name] = FeatureNetworkSpec(
        name=name, make=make, mean=np.asarray(mean, np.float32),
        std=np.asarray(std, np.float32), convert=convert,
        channels=tuple(channels), nested=nested,
        fixed_input_res=fixed_input_res)


def available() -> List[str]:
    return sorted(_REGISTRY)


def get_spec(name: str) -> FeatureNetworkSpec:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown feature network '{name}'; available: {available()}")
    return _REGISTRY[name]


def make_feature_network(name: str) -> Tuple[nn.Module, FeatureNetworkSpec]:
    """Instantiate a registered 4-stage feature extractor."""
    spec = get_spec(name)
    return spec.make(), spec


def convert_feature_network_state(
        name: str, state: Mapping[str, np.ndarray]) -> dict:
    """Pretrained torch/timm state dict → flax variables for `name`'s
    module as instantiated by ``make_feature_network`` (handles the
    SlicedStages nesting)."""
    spec = get_spec(name)
    assert spec.convert is not None, f"{name} has no converter"
    variables = spec.convert(state)
    if spec.nested:
        variables = {coll: {"net": sub} for coll, sub in variables.items()}
    return variables


# ------------------------------------------------------------------ entries


def _register_defaults():
    from .alexnet import AlexNetFeatures, convert_alexnet_state
    from .clip import CLIPViTStages, convert_clip_state
    from .deit import (DeiTFeatures, DeiTSmallFeatures, DeiTTinyFeatures,
                       ViTBaseFeatures, convert_deit)
    from .efficientnet import (EfficientNetB0Features,
                               EfficientNetLite0Features,
                               convert_efficientnet_b0,
                               convert_efficientnet_lite0)
    from .resnet import (BOTTLENECK_STAGES, ResNet18Stages, ResNet34Stages,
                         ResNet50Stages, ResNetBottleneckStages,
                         convert_bottleneck_stages_state,
                         convert_resnet18_state, convert_resnet34_state,
                         convert_resnet50_state)
    from .vgg import (VGG16Features, VGG19Features, convert_vgg16_state,
                      convert_vgg19_state)

    # Reference defaults (train_setgan.py:223-240).
    register("deit_base_distilled_patch16_224", DeiTFeatures,
             IMAGENET_MEAN, IMAGENET_STD, convert_deit,
             (96, 192, 384, 768), fixed_input_res=224)
    register("tf_efficientnet_lite0", EfficientNetLite0Features,
             INCEPTION_MEAN, INCEPTION_STD, convert_efficientnet_lite0,
             (24, 40, 112, 320))
    # Full B0 (SE + SiLU) — IMAGENET stats per the reference
    # (constants.py EFFNETS_IMAGENET, projector.get_backbone_normstats).
    register("tf_efficientnet_b0", EfficientNetB0Features,
             IMAGENET_MEAN, IMAGENET_STD, convert_efficientnet_b0,
             (24, 40, 112, 320))
    # Compound-scaled b/lite ladder (reference EFFNETS, constants.py:67-91;
    # b-series = IMAGENET stats, lite = INCEPTION stats).
    from .efficientnet import make_efficientnet
    for _name in ("tf_efficientnet_b1", "tf_efficientnet_b2",
                  "tf_efficientnet_b3", "tf_efficientnet_b4",
                  "tf_efficientnet_b0_ns", "tf_efficientnet_lite1",
                  "tf_efficientnet_lite2", "tf_efficientnet_lite3",
                  "tf_efficientnet_lite4"):
        _make, _convert, _channels = make_efficientnet(_name)
        _lite = "lite" in _name
        register(_name, _make,
                 INCEPTION_MEAN if _lite else IMAGENET_MEAN,
                 INCEPTION_STD if _lite else IMAGENET_STD,
                 _convert, _channels)
    # timm 'efficientnet_b1' (non-tf): same b1 graph; the reference
    # normalizes it with Inception stats (constants.py EFFNETS_INCEPTION).
    _make, _convert, _channels = make_efficientnet("tf_efficientnet_b1")
    register("efficientnet_b1", _make, INCEPTION_MEAN, INCEPTION_STD,
             _convert, _channels)
    register("deit_small_distilled_patch16_224", DeiTSmallFeatures,
             IMAGENET_MEAN, IMAGENET_STD, convert_deit,
             (48, 96, 192, 384), fixed_input_res=224)
    register("deit_tiny_distilled_patch16_224", DeiTTinyFeatures,
             IMAGENET_MEAN, IMAGENET_STD, convert_deit,
             (24, 48, 96, 192), fixed_input_res=224)
    # Plain ViT: INCEPTION stats (constants.py VITS_INCEPTION).
    register("vit_base_patch16_224", ViTBaseFeatures,
             INCEPTION_MEAN, INCEPTION_STD, convert_deit,
             (96, 192, 384, 768), fixed_input_res=224)
    # Conv families.
    register("vgg16",
             lambda **kw: SlicedStages(VGG16Features, take=(1, 2, 3, 4), **kw),
             IMAGENET_MEAN, IMAGENET_STD, convert_vgg16_state,
             (128, 256, 512, 512), nested=True)
    register("alexnet",
             lambda **kw: SlicedStages(AlexNetFeatures, take=(1, 2, 3, 4), **kw),
             IMAGENET_MEAN, IMAGENET_STD, convert_alexnet_state,
             (192, 384, 256, 256), nested=True)
    register("resnet50", ResNet50Stages, IMAGENET_MEAN, IMAGENET_STD,
             convert_resnet50_state, (256, 512, 1024, 2048))
    # Deeper / wider / SE bottleneck variants share the module + converter
    # (reference pretrained_builder.py:242-257, 310-314).
    for _name in ("resnet101", "resnet152", "wide_resnet50_2",
                  "wide_resnet101_2", "seresnet50", "resnet26"):
        _stages = BOTTLENECK_STAGES[_name]
        _se = _name.startswith("seresnet")
        register(_name,
                 (lambda _s=_stages, _e=_se: (
                     lambda **kw: ResNetBottleneckStages(stages=_s, se=_e,
                                                         **kw)))(),
                 IMAGENET_MEAN, IMAGENET_STD,
                 (lambda _s=_stages, _e=_se: (
                     lambda state: convert_bottleneck_stages_state(
                         state, _s, se=_e)))(),
                 (256, 512, 1024, 2048))
    # timm -d variants: deep 3x3 stem + avg-pool downsample
    # (reference resnet26d/resnet50d, constants.py:25-26).
    for _name, _base in (("resnet26d", "resnet26"), ("resnet50d", "resnet50")):
        _stages = BOTTLENECK_STAGES[_base]
        register(_name,
                 (lambda _s=_stages: (
                     lambda **kw: ResNetBottleneckStages(
                         stages=_s, deep_stem=True, avg_down=True, **kw)))(),
                 IMAGENET_MEAN, IMAGENET_STD,
                 (lambda _s=_stages: (
                     lambda state: convert_bottleneck_stages_state(
                         state, _s)))(),
                 (256, 512, 1024, 2048))
    register("resnet34", ResNet34Stages, IMAGENET_MEAN, IMAGENET_STD,
             convert_resnet34_state, (64, 128, 256, 512))
    register("resnet18", ResNet18Stages, IMAGENET_MEAN, IMAGENET_STD,
             convert_resnet18_state, (64, 128, 256, 512))
    register("vgg19",
             lambda **kw: SlicedStages(VGG19Features, take=(1, 2, 3, 4), **kw),
             IMAGENET_MEAN, IMAGENET_STD, convert_vgg19_state,
             (128, 256, 512, 512), nested=True)
    # BN variants (reference TORCHVISION: vgg11_bn/13_bn/16_bn/19_bn).
    from .vgg import make_vgg
    for _name in ("vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn"):
        _make, _convert = make_vgg(_name)
        register(_name,
                 (lambda _m=_make: (
                     lambda **kw: SlicedStages(_m, take=(1, 2, 3, 4), **kw)))(),
                 IMAGENET_MEAN, IMAGENET_STD, _convert,
                 (128, 256, 512, 512), nested=True)
    # DenseNet family (reference _make_densenet, pretrained_builder.py:84-101).
    from .densenet import make_densenet
    for _name in ("densenet121", "densenet169", "densenet201"):
        _make, _convert, _channels = make_densenet(_name)
        register(_name, _make, IMAGENET_MEAN, IMAGENET_STD, _convert,
                 _channels)
    # Mobile families (reference splits at pretrained_builder.py:258-283).
    from .mobilenet import (MNASNetStages, MobileNetV2Stages,
                            convert_mnasnet_state, convert_mobilenet_v2_state,
                            mnasnet_channels)
    from .shufflenet import ShuffleNetV2Stages, convert_shufflenet_state
    register("mobilenet_v2", MobileNetV2Stages, IMAGENET_MEAN, IMAGENET_STD,
             convert_mobilenet_v2_state, (24, 32, 96, 320))
    for _alpha, _name in ((0.5, "mnasnet0_5"), (1.0, "mnasnet1_0")):
        _, _outs = mnasnet_channels(_alpha)
        register(_name,
                 (lambda _a=_alpha: (
                     lambda **kw: MNASNetStages(alpha=_a, **kw)))(),
                 IMAGENET_MEAN, IMAGENET_STD,
                 (lambda _a=_alpha: (
                     lambda state: convert_mnasnet_state(state, _a)))(),
                 (_outs[0], _outs[1], _outs[3], _outs[5]))
    register("shufflenet_v2_x0_5", ShuffleNetV2Stages,
             IMAGENET_MEAN, IMAGENET_STD, convert_shufflenet_state,
             (24, 48, 96, 192))
    # RegNetX/Y ladder (reference REGNETS, constants.py:33-64; splitter
    # pretrained_builder.py:32-40).
    from .regnet import REGNET_PARAMS, make_regnet
    for _name in REGNET_PARAMS:
        _make, _convert, _channels = make_regnet(_name)
        register(_name, _make, IMAGENET_MEAN, IMAGENET_STD, _convert,
                 _channels)
    # ViT family via the CLIP visual trunk (reference vit_* families,
    # pretrained_builder.py:131-195).
    register("clip_vit_b32", CLIPViTStages, CLIP_MEAN, CLIP_STD,
             _convert_clip_visual, (96, 192, 384, 768), fixed_input_res=224)
    # CLIP RN50 visual trunk (reference 'resnet50_clip',
    # pretrained_builder.py:402-404).
    from .clip_resnet import CLIPResNet50Stages, convert_clip_resnet_state
    register("resnet50_clip", CLIPResNet50Stages, CLIP_MEAN, CLIP_STD,
             convert_clip_resnet_state, (256, 512, 1024, 2048))


def _convert_clip_visual(state: Mapping[str, np.ndarray]) -> dict:
    from .clip import convert_clip_visual_state

    return convert_clip_visual_state(state)


_register_defaults()
