"""Cross-framework parity: our generator vs the reference torch model (CPU).

Loads the reference's own networks (impl='ref' CPU ops) from /root/reference,
copies its randomly-initialized weights through the checkpoint converter, and
compares outputs on identical latents. This is the strongest correctness
oracle available without pretrained weights (SURVEY.md §4 test strategy).
Skipped when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

TINY = dict(
    z_dim=64,
    c_dim=0,
    w_dim=64,
    img_resolution=64,
    img_channels=3,
    channel_base=2048,
    channel_max=64,
    num_layers=6,
    num_critical=2,
)


@pytest.fixture(scope="module")
def ref_generator():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from models.stylegan3.networks_stylegan3 import Generator as TorchGenerator

    torch.manual_seed(0)
    g = TorchGenerator(**TINY).eval()
    return torch, g


def _our_model_and_vars(ref_generator, **cfg_overrides):
    torch, g = ref_generator
    from stylegan3_editing_tpu.models.sg3 import Generator, SG3Config
    from stylegan3_editing_tpu.models.sg3.convert import torch_state_to_variables

    cfg = SG3Config(
        z_dim=TINY["z_dim"], c_dim=TINY["c_dim"], w_dim=TINY["w_dim"],
        img_resolution=TINY["img_resolution"], img_channels=TINY["img_channels"],
        channel_base=TINY["channel_base"], channel_max=TINY["channel_max"],
        num_layers=TINY["num_layers"], num_critical=TINY["num_critical"],
        use_bf16=False, **cfg_overrides)
    state = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    variables, transform = torch_state_to_variables(state, cfg)
    assert transform is not None and transform.shape == (3, 3)
    return Generator(cfg), variables


@pytest.mark.slow
def test_full_generator_parity(ref_generator):
    torch, g = ref_generator
    model, variables = _our_model_and_vars(ref_generator)

    z = np.random.RandomState(1).randn(2, TINY["z_dim"]).astype(np.float32)
    with torch.no_grad():
        want = g(torch.from_numpy(z), None).numpy()  # NCHW

    got = model.apply(variables, jnp.asarray(z))  # NHWC
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))

    assert got_nchw.shape == want.shape
    np.testing.assert_allclose(got_nchw, want, rtol=1e-3, atol=2e-3)


def test_mapping_parity(ref_generator):
    torch, g = ref_generator
    model, variables = _our_model_and_vars(ref_generator)

    z = np.random.RandomState(2).randn(3, TINY["z_dim"]).astype(np.float32)
    with torch.no_grad():
        want = g.mapping(torch.from_numpy(z), None, truncation_psi=0.7).numpy()
    got = model.apply(variables, jnp.asarray(z), truncation_psi=0.7,
                      method=model.map)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_w2s_parity(ref_generator):
    torch, g = ref_generator
    model, variables = _our_model_and_vars(ref_generator)

    z = np.random.RandomState(3).randn(2, TINY["z_dim"]).astype(np.float32)
    with torch.no_grad():
        ws_t = g.mapping(torch.from_numpy(z), None)
        want = {k: v.numpy() for k, v in g.synthesis.W2S(ws_t).items()}

    ws = model.apply(variables, jnp.asarray(z), method=model.map)
    got = model.apply(variables, ws, method=model.w2s)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_synthesis_with_transform_parity(ref_generator):
    """Writing `synthesis.input.transform` in torch == passing transform here."""
    torch, g = ref_generator
    model, variables = _our_model_and_vars(ref_generator)

    m = np.eye(3, dtype=np.float32)
    m[0, 2], m[1, 2] = 0.2, -0.1

    z = np.random.RandomState(4).randn(1, TINY["z_dim"]).astype(np.float32)
    with torch.no_grad():
        ws_t = g.mapping(torch.from_numpy(z), None)
        g.synthesis.input.transform.copy_(torch.from_numpy(m))
        want = g.synthesis(ws_t).numpy()
        g.synthesis.input.transform.copy_(torch.eye(3))

    ws = model.apply(variables, jnp.asarray(z), method=model.map)
    got = model.apply(variables, ws, transform=jnp.asarray(m),
                      method=model.synthesize)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-3, atol=2e-3)


def test_npz_roundtrip(ref_generator, tmp_path):
    from stylegan3_editing_tpu.models.sg3.convert import (
        npz_to_variables,
        variables_to_npz,
    )
    model, variables = _our_model_and_vars(ref_generator)
    path = str(tmp_path / "gen.npz")
    variables_to_npz(variables, path)
    restored = npz_to_variables(path)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sg2_stem_parity_with_reference():
    """NVIDIA-convention SG2 stem vs the reference networks_stylegan2
    Generator (impl='ref' CPU ops) with converted weights at tiny res
    (VERDICT r2 #7). Covers the w-broadcast layout (ToRGB consumes the NEXT
    w) and the up-conv/blur composition."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from models.styleganxl.training.networks_stylegan2 import (
        Generator as TorchSG2)

    from stylegan3_editing_tpu.models.sg2_stem import (
        SG2Config, SG2Generator, convert_sg2_state)

    res, wd = 16, 32
    tg = TorchSG2(z_dim=wd, c_dim=0, w_dim=wd, img_resolution=res,
                  img_channels=3, channel_base=1024, channel_max=64,
                  mapping_kwargs={"num_layers": 2}, num_fp16_res=0,
                  conv_clamp=None)
    tg.eval()
    state = {k: v.detach().numpy() for k, v in tg.state_dict().items()}

    cfg = SG2Config(z_dim=wd, w_dim=wd, img_resolution=res,
                    channel_base=1024, channel_max=64, mapping_layers=2,
                    num_fp16_res=0, use_bf16=False, conv_clamp=None)
    model = SG2Generator(cfg)
    assert cfg.num_ws == tg.num_ws, (cfg.num_ws, tg.num_ws)

    rng = np.random.RandomState(0)
    ws_np = rng.randn(2, tg.num_ws, wd).astype(np.float32)

    with torch.no_grad():
        want = tg.synthesis(torch.from_numpy(ws_np), noise_mode="none",
                            force_fp32=True)
    want = want.numpy().transpose(0, 2, 3, 1)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, wd)))
    converted = convert_sg2_state(state, cfg)
    merged = dict(variables)
    merged["params"] = _merge_trees(variables["params"],
                                    converted["params"])
    got = model.apply(merged, jnp.asarray(ws_np), method=model.synthesize,
                      force_fp32=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def _merge_trees(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees(out[k], v)
        else:
            assert k in out, f"converter produced unknown param {k}"
            assert np.shape(out[k]) == np.shape(v), (k, np.shape(out[k]),
                                                     np.shape(v))
            out[k] = v
    return out


def test_clip_resnet50_parity_with_reference():
    """Our CLIP ModifiedResNet-50 trunk vs the reference's vendored torch
    implementation (clip/model.py:10-133) with randomized weights AND
    batch-norm statistics, sliced exactly as `_make_resnet_clip`
    (pretrained_builder.py:60-82): stage outputs must match at every one
    of the 4 feature taps."""
    torch = pytest.importorskip("torch")
    import importlib.util

    path = os.path.join(
        REF, "models/styleganxl/feature_networks/clip/model.py")
    spec = importlib.util.spec_from_file_location("ref_clip_model", path)
    ref_clip = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_clip)

    torch.manual_seed(0)
    m = ref_clip.ModifiedResNet(layers=(3, 4, 6, 3), output_dim=128,
                                heads=4, input_resolution=64).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for name, b in m.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=gen) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=gen) + 0.5)

    x_np = np.random.RandomState(2).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x_np)
        for conv, bn in ((m.conv1, m.bn1), (m.conv2, m.bn2),
                         (m.conv3, m.bn3)):
            t = m.relu(bn(conv(t)))
        t = m.avgpool(t)
        want = []
        for layer in (m.layer1, m.layer2, m.layer3, m.layer4):
            t = layer(t)
            want.append(t.numpy().transpose(0, 2, 3, 1))

    from stylegan3_editing_tpu.models.backbones.clip_resnet import (
        CLIPResNet50Stages, convert_clip_resnet_state)

    state = {k: v.detach().numpy() for k, v in m.state_dict().items()
             if not k.startswith("attnpool.")}
    variables = convert_clip_resnet_state(state)
    got = CLIPResNet50Stages().apply(
        variables, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4, atol=2e-4)
