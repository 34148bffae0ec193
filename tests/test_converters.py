"""Weight-converter key maps: fabricate torch-style state dicts with the
exact released naming/shapes, convert, and run the models — catches any
converter key/transpose mistakes without the actual weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

RNG = np.random.RandomState(0)


def _alexnet_state():
    shapes = {
        "features.0.weight": (64, 3, 11, 11), "features.0.bias": (64,),
        "features.3.weight": (192, 64, 5, 5), "features.3.bias": (192,),
        "features.6.weight": (384, 192, 3, 3), "features.6.bias": (384,),
        "features.8.weight": (256, 384, 3, 3), "features.8.bias": (256,),
        "features.10.weight": (256, 256, 3, 3), "features.10.bias": (256,),
    }
    return {k: RNG.randn(*s).astype(np.float32) * 0.05 for k, s in shapes.items()}


def test_alexnet_converter_runs():
    from stylegan3_editing_tpu.models.backbones.alexnet import (
        AlexNetFeatures,
        convert_alexnet_state,
    )
    variables = convert_alexnet_state(_alexnet_state())
    feats = AlexNetFeatures().apply(variables, jnp.zeros((1, 224, 224, 3)))
    assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]


def test_vgg16_converter_runs():
    from stylegan3_editing_tpu.models.backbones.vgg import (
        VGG16Features,
        convert_vgg16_state,
    )
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    torch_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    state = {}
    in_c = 3
    for w, ti in zip(widths, torch_idx):
        state[f"features.{ti}.weight"] = RNG.randn(w, in_c, 3, 3).astype(
            np.float32) * 0.05
        state[f"features.{ti}.bias"] = np.zeros(w, np.float32)
        in_c = w
    variables = convert_vgg16_state(state)
    feats = VGG16Features().apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]


def test_resnet50_converter_runs():
    torch = pytest.importorskip("torch")
    from stylegan3_editing_tpu.models.backbones.resnet import (
        ResNet50Features,
        convert_resnet50_state,
    )
    # Fabricate the torchvision naming via shapes from our own random init —
    # build names for every expected key.
    state = {}
    def bn(prefix, c):
        state[f"{prefix}.weight"] = np.ones(c, np.float32)
        state[f"{prefix}.bias"] = np.zeros(c, np.float32)
        state[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        state[f"{prefix}.running_var"] = np.ones(c, np.float32)
    state["conv1.weight"] = RNG.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    bn("bn1", 64)
    stages = ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))
    in_c = 64
    for si, (blocks, width, out_c) in enumerate(stages, start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = RNG.randn(width, in_c, 1, 1).astype(np.float32) * 0.05
            bn(f"{t}.bn1", width)
            state[f"{t}.conv2.weight"] = RNG.randn(width, width, 3, 3).astype(np.float32) * 0.05
            bn(f"{t}.bn2", width)
            state[f"{t}.conv3.weight"] = RNG.randn(out_c, width, 1, 1).astype(np.float32) * 0.05
            bn(f"{t}.bn3", out_c)
            if bi == 0:
                state[f"{t}.downsample.0.weight"] = RNG.randn(out_c, in_c, 1, 1).astype(np.float32) * 0.05
                bn(f"{t}.downsample.1", out_c)
            in_c = out_c
    variables = convert_resnet50_state(state)
    out = ResNet50Features().apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2048)


def test_clip_converter_runs():
    from stylegan3_editing_tpu.models.backbones.clip import CLIP, convert_clip_state

    state = {}
    def ln(prefix, d):
        state[f"{prefix}.weight"] = np.ones(d, np.float32)
        state[f"{prefix}.bias"] = np.zeros(d, np.float32)
    def block(prefix, d):
        state[f"{prefix}.attn.in_proj_weight"] = RNG.randn(3 * d, d).astype(np.float32) * 0.02
        state[f"{prefix}.attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
        state[f"{prefix}.attn.out_proj.weight"] = RNG.randn(d, d).astype(np.float32) * 0.02
        state[f"{prefix}.attn.out_proj.bias"] = np.zeros(d, np.float32)
        ln(f"{prefix}.ln_1", d)
        ln(f"{prefix}.ln_2", d)
        state[f"{prefix}.mlp.c_fc.weight"] = RNG.randn(4 * d, d).astype(np.float32) * 0.02
        state[f"{prefix}.mlp.c_fc.bias"] = np.zeros(4 * d, np.float32)
        state[f"{prefix}.mlp.c_proj.weight"] = RNG.randn(d, 4 * d).astype(np.float32) * 0.02
        state[f"{prefix}.mlp.c_proj.bias"] = np.zeros(d, np.float32)

    state["visual.conv1.weight"] = RNG.randn(768, 3, 32, 32).astype(np.float32) * 0.02
    state["visual.class_embedding"] = RNG.randn(768).astype(np.float32) * 0.02
    state["visual.positional_embedding"] = RNG.randn(50, 768).astype(np.float32) * 0.02
    ln("visual.ln_pre", 768)
    for i in range(12):
        block(f"visual.transformer.resblocks.{i}", 768)
    ln("visual.ln_post", 768)
    state["visual.proj"] = RNG.randn(768, 512).astype(np.float32) * 0.02
    state["token_embedding.weight"] = RNG.randn(49408, 512).astype(np.float32) * 0.02
    state["positional_embedding"] = RNG.randn(77, 512).astype(np.float32) * 0.02
    for i in range(12):
        block(f"transformer.resblocks.{i}", 512)
    ln("ln_final", 512)
    state["text_projection"] = RNG.randn(512, 512).astype(np.float32) * 0.02
    state["logit_scale"] = np.asarray(2.0, np.float32)

    variables = convert_clip_state(state)
    model = CLIP()
    img = jnp.zeros((1, 224, 224, 3))
    txt = jnp.ones((2, 77), jnp.int32)
    li, lt = model.apply(variables, img, txt)
    assert li.shape == (1, 2)
    assert bool(jnp.isfinite(li).all())


def test_resnet34_body_converter_runs():
    from stylegan3_editing_tpu.models.backbones.resnet import (
        RESNET34_LAYERS,
        ResNet34Body,
        convert_resnet34_body_state,
    )
    state = {}
    def bn(prefix, c):
        state[f"{prefix}.weight"] = np.ones(c, np.float32)
        state[f"{prefix}.bias"] = np.zeros(c, np.float32)
        state[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        state[f"{prefix}.running_var"] = np.ones(c, np.float32)
    in_c = 64
    for si, (blocks, ch) in enumerate(RESNET34_LAYERS, start=1):
        for bi in range(blocks):
            t = f"layer{si}.{bi}"
            state[f"{t}.conv1.weight"] = RNG.randn(ch, in_c, 3, 3).astype(np.float32) * 0.05
            bn(f"{t}.bn1", ch)
            state[f"{t}.conv2.weight"] = RNG.randn(ch, ch, 3, 3).astype(np.float32) * 0.05
            bn(f"{t}.bn2", ch)
            if bi == 0 and si > 1:
                state[f"{t}.downsample.0.weight"] = RNG.randn(ch, in_c, 1, 1).astype(np.float32) * 0.05
                bn(f"{t}.downsample.1", ch)
            in_c = ch
    variables = convert_resnet34_body_state(state)
    out = ResNet34Body().apply(variables, jnp.zeros((1, 64, 64, 64)))
    assert out.shape == (1, 8, 8, 512)
