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


# --- set transformer parity (reference models/setgan/set.py) -------------

def _load_ref_set_module():
    """Load the reference's set.py standalone (its only intra-repo import,
    setgan.utils.masked_softmax, is provided via a stub module so we don't
    drag in the reference's full setgan package)."""
    import importlib.util
    import types

    torch = pytest.importorskip("torch")
    if "setgan" not in sys.modules or not hasattr(
            sys.modules.get("setgan.utils", None), "masked_softmax"):
        pkg = types.ModuleType("setgan")
        utils = types.ModuleType("setgan.utils")

        def masked_softmax(x, mask, dim=-1, eps=1e-8):
            x = x - x.max(dim=dim, keepdim=True)[0]
            x = x.masked_fill(mask == 0, -float("inf"))
            e = torch.exp(x)
            return e / (e.sum(dim=dim, keepdim=True) + eps)

        utils.masked_softmax = masked_softmax
        pkg.utils = utils
        sys.modules["setgan"] = pkg
        sys.modules["setgan.utils"] = utils
    path = os.path.join(REF, "models/setgan/set.py")
    spec = importlib.util.spec_from_file_location("ref_set", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return torch, mod


def _t_lin(state, name):
    p = {"kernel": np.asarray(state[f"{name}.weight"]).T}
    if f"{name}.bias" in state:
        p["bias"] = np.asarray(state[f"{name}.bias"])
    return p


def _t_ln(state, name):
    return {"scale": np.asarray(state[f"{name}.weight"]),
            "bias": np.asarray(state[f"{name}.bias"])}


def _t_mha(state, pfx, use_temperature=False):
    out = {w: _t_lin(state, f"{pfx}.{w}") for w in
           ("w_q", "w_k", "w_v", "w_o")}
    if use_temperature:
        out["temperature"] = np.asarray(state[f"{pfx}.temperature"])
    return out


def _t_sab(state, pfx):
    return {"attn": _t_mha(state, f"{pfx}.attn"),
            "fc1": _t_lin(state, f"{pfx}.fc.0"),
            "fc2": _t_lin(state, f"{pfx}.fc.2"),
            "ln0": _t_ln(state, f"{pfx}.ln0"),
            "ln1": _t_ln(state, f"{pfx}.ln1")}


def test_set_transformer_encoder_parity_with_reference():
    """SetTransformerEncoder vs reference set.py:126 with converted
    weights, both unmasked and with a key mask (the reference scales
    logits by sqrt(latent_size), not sqrt(head_dim) — set.py:34)."""
    torch, ref = _load_ref_set_module()
    from stylegan3_editing_tpu.setgan.set_transformer import (
        SetTransformerEncoder)

    din, dlat, dhid, heads, blocks = 12, 16, 32, 4, 2
    torch.manual_seed(0)
    tenc = ref.SetTransformerEncoder(din, dlat, dhid, heads, blocks,
                                     ln=True, dropout=0).eval()
    state = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}

    params = {"proj": _t_lin(state, "proj")}
    for i in range(blocks):
        params[f"block_{i}"] = {"attn": _t_sab(state, f"block_{i}.attn")}

    enc = SetTransformerEncoder(din, dlat, dhid, heads, blocks,
                                ln=True, dropout=0.0)
    rng = np.random.RandomState(1)
    x = rng.randn(3, 5, din).astype(np.float32)

    with torch.no_grad():
        want = tenc(torch.from_numpy(x)).numpy()
    got = enc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # Masked: last two keys of every set invalid.
    mask = np.ones((3, 5, 5), bool)
    mask[:, :, 3:] = False
    with torch.no_grad():
        want_m = tenc(torch.from_numpy(x),
                      mask=torch.from_numpy(mask)).numpy()
    got_m = enc.apply({"params": params}, jnp.asarray(x),
                      mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_m), want_m,
                               rtol=1e-5, atol=1e-5)


def test_set_transformer_decoder_parity_with_reference():
    """SetTransformerDecoder (self-attn + temperature-scaled MHA) vs
    reference set.py:141 with converted weights."""
    torch, ref = _load_ref_set_module()
    from stylegan3_editing_tpu.setgan.set_transformer import (
        SetTransformerDecoder)

    din, dlat, dhid, denc, heads, blocks = 16, 16, 32, 16, 4, 2
    torch.manual_seed(0)
    tdec = ref.SetTransformerDecoder(
        din, dlat, dhid, denc, heads, blocks, ln=True, dropout=0,
        self_attn=True, use_temperature=True).eval()
    with torch.no_grad():  # make the learned temperatures non-trivial
        for name, p in tdec.named_parameters():
            if name.endswith("temperature"):
                p.fill_(1.7)
    state = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}

    params = {}
    for i in range(blocks):
        pfx = f"blocks.{i}"
        params[f"block_{i}"] = {
            "attn1": _t_mha(state, f"{pfx}.attn1", use_temperature=True),
            "attn2": _t_mha(state, f"{pfx}.attn2", use_temperature=True),
            "fc1": _t_lin(state, f"{pfx}.fc.0"),
            "fc2": _t_lin(state, f"{pfx}.fc.2"),
            "ln0": _t_ln(state, f"{pfx}.ln0"),
            "ln1": _t_ln(state, f"{pfx}.ln1"),
            "ln2": _t_ln(state, f"{pfx}.ln2"),
        }

    dec = SetTransformerDecoder(din, dlat, dhid, heads, blocks, ln=True,
                                dropout=0.0, self_attn=True,
                                use_temperature=True)
    rng = np.random.RandomState(2)
    q = rng.randn(3, 4, din).astype(np.float32)
    k = rng.randn(3, 6, denc).astype(np.float32)

    with torch.no_grad():
        want = tdec(torch.from_numpy(q), torch.from_numpy(k)).numpy()
    got = dec.apply({"params": params}, jnp.asarray(q), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sharing", ["none", "cross", "sym"])
def test_multiset_encoder_parity_with_reference(sharing):
    """MultiSetTransformerEncoder (the set discriminator's core — joint
    self/cross attention over reference and candidate sets, set.py:169-256)
    vs the reference with converted weights, per weight-sharing mode."""
    torch, ref = _load_ref_set_module()
    from stylegan3_editing_tpu.setgan.set_transformer import (
        MultiSetTransformerEncoder)

    xs, dlat, dhid, heads, blocks = 10, 16, 32, 4, 2
    torch.manual_seed(0)
    tenc = ref.MultiSetTransformerEncoder(
        xs, xs, dlat, dhid, heads, blocks, weight_sharing=sharing,
        ln=True, dropout=0).eval()
    state = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}

    params = {"proj_x": _t_lin(state, "proj_x"),
              "proj_y": _t_lin(state, "proj_y")}
    mab_names = {  # ref attr name → our module name
        "none": {"MAB_XX": "MAB_XX", "MAB_YY": "MAB_YY",
                 "MAB_XY": "MAB_XY", "MAB_YX": "MAB_YX"},
        "cross": {"MAB_XX": "MAB_XX", "MAB_YY": "MAB_YY",
                  "MAB_XY": "MAB_cross"},
        "sym": {"MAB_XX": "MAB_self", "MAB_XY": "MAB_cross"},
    }[sharing]
    for i in range(blocks):
        blk = {ours: _t_sab(state, f"blocks.{i}.{theirs}")
               for theirs, ours in mab_names.items()}
        blk["fc_X"] = _t_lin(state, f"blocks.{i}.fc_X")
        blk["fc_Y"] = _t_lin(state, f"blocks.{i}.fc_Y")
        blk["ln_x"] = _t_ln(state, f"blocks.{i}.ln_x")
        blk["ln_y"] = _t_ln(state, f"blocks.{i}.ln_y")
        params[f"block_{i}"] = blk

    enc = MultiSetTransformerEncoder(xs, xs, dlat, dhid, heads, blocks,
                                     weight_sharing=sharing, ln=True,
                                     dropout=0.0)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, xs).astype(np.float32)
    y = rng.randn(2, 7, xs).astype(np.float32)

    with torch.no_grad():
        want_x, want_y = tenc(torch.from_numpy(x), torch.from_numpy(y))
    got_x, got_y = enc.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_y), want_y.numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pooling", ["mean", "pma"])
def test_multiset_comparator_parity_with_reference(pooling):
    """MultiSetComparator vs the reference MultiSetTransformer under the
    set discriminator's kwargs (decoder_layers=0, ln=True, dropout=0 —
    discriminator.py:96-107): encoder → pool → [ZX | ZY | ZX·ZY] → Linear
    → logit. 'mean' is the discriminator's choice; 'pma' is
    MultiSetTransformer's own default (set.py:376)."""
    torch, ref = _load_ref_set_module()
    from stylegan3_editing_tpu.setgan.discriminator import MultiSetComparator

    dlat, heads, blocks = 16, 4, 2
    torch.manual_seed(0)
    tmod = ref.MultiSetTransformer(
        dlat, dlat, dlat, dlat, 1, num_heads=heads, num_blocks=blocks,
        ln=True, weight_sharing="none", dropout=0, decoder_layers=0,
        pooling=pooling).eval()
    state = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}

    enc = {}
    for i in range(blocks):
        blk = {n: _t_sab(state, f"encoder.blocks.{i}.{n}")
               for n in ("MAB_XX", "MAB_YY", "MAB_XY", "MAB_YX")}
        blk["fc_X"] = _t_lin(state, f"encoder.blocks.{i}.fc_X")
        blk["fc_Y"] = _t_lin(state, f"encoder.blocks.{i}.fc_Y")
        blk["ln_x"] = _t_ln(state, f"encoder.blocks.{i}.ln_x")
        blk["ln_y"] = _t_ln(state, f"encoder.blocks.{i}.ln_y")
        enc[f"block_{i}"] = blk
    params = {"encoder": enc, "decoder": _t_lin(state, "decoder")}
    if pooling == "pma":
        for ours, theirs in (("pool_x", "pool_x"), ("pool_y", "pool_y")):
            params[ours] = {"S": np.asarray(state[f"{theirs}.S"]),
                            "mab": _t_sab(state, f"{theirs}.mab")}

    rng = np.random.RandomState(4)
    r = rng.randn(3, 5, dlat).astype(np.float32)
    x = rng.randn(3, 6, dlat).astype(np.float32)

    with torch.no_grad():
        want = tmod(torch.from_numpy(r), torch.from_numpy(x)).numpy()
    comp = MultiSetComparator(dlat, num_heads=heads, num_blocks=blocks,
                              pooling=pooling)
    got = comp.apply({"params": params}, jnp.asarray(r), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).ravel(), want.ravel(),
                               rtol=1e-5, atol=1e-5)


def _t_decoder_params(state, blocks, pfx="blocks", use_temperature=True):
    out = {}
    for i in range(blocks):
        out[f"block_{i}"] = {
            "attn1": _t_mha(state, f"{pfx}.{i}.attn1",
                            use_temperature=use_temperature),
            "attn2": _t_mha(state, f"{pfx}.{i}.attn2",
                            use_temperature=use_temperature),
            "fc1": _t_lin(state, f"{pfx}.{i}.fc.0"),
            "fc2": _t_lin(state, f"{pfx}.{i}.fc.2"),
            "ln0": _t_ln(state, f"{pfx}.{i}.ln0"),
            "ln1": _t_ln(state, f"{pfx}.{i}.ln1"),
            "ln2": _t_ln(state, f"{pfx}.{i}.ln2"),
        }
    return out


def test_style_attention_parity_with_reference():
    """StyleAttention vs the reference composition (setgan.py:22-56): per
    style index, a temperature-scaled SetTransformerDecoder attends the
    mapped noise styles (queries) to the reference-set codes (keys), then
    [out | style] is projected by a FullyConnectedLayer whose weight starts
    as [N(0,0.2) | I]. The reference module itself can't be imported here
    (its encoder deps need torchvision + CUDA extension builds), so the
    oracle composes the same two reference layers per setgan.py:44-56."""
    torch, ref = _load_ref_set_module()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.stylegan3.networks_stylegan3 import FullyConnectedLayer

    from stylegan3_editing_tpu.setgan.model import StyleAttention

    n_styles, latent, heads, layers = 3, 16, 4, 2
    torch.manual_seed(0)
    attns, fcs = [], []
    for _ in range(n_styles):
        attns.append(ref.SetTransformerDecoder(
            latent, latent, latent * 2, latent, heads, layers, ln=True,
            activation_fct=torch.nn.LeakyReLU, self_attn=True, dropout=0,
            use_temperature=True).eval())
        fc = FullyConnectedLayer(latent * 2, latent)
        with torch.no_grad():  # reference init, setgan.py:40-43
            torch.nn.init.normal_(fc.weight[:, :latent], std=0.2)
            torch.nn.init.eye_(fc.weight[:, latent:])
        fcs.append(fc.eval())
    for m in attns:  # non-trivial learned temperatures
        with torch.no_grad():
            for name, p in m.named_parameters():
                if name.endswith("temperature"):
                    p.fill_(1.4)

    params = {}
    for i in range(n_styles):
        state = {k: v.detach().numpy()
                 for k, v in attns[i].state_dict().items()}
        params[f"attn_{i}"] = _t_decoder_params(state, layers)
        params[f"style_concat_{i}"] = {
            "weight": fcs[i].weight.detach().numpy(),
            "bias": fcs[i].bias.detach().numpy()}

    rng = np.random.RandomState(5)
    codes = rng.randn(2, 5, n_styles, latent).astype(np.float32)  # [B,R,S,D]
    styles = rng.randn(2, 4, n_styles, latent).astype(np.float32)  # [B,C,S,D]

    # Reference forward, setgan.py:44-56 (z=codes, s=styles).
    z, s = torch.from_numpy(codes), torch.from_numpy(styles)
    want = []
    with torch.no_grad():
        for i in range(n_styles):
            out_i = attns[i](s[:, :, i], z[:, :, i])
            out_i = torch.cat([out_i, s[:, :, i]], dim=-1)
            out_i = fcs[i](out_i.view(-1, out_i.size(-1))).view(
                *out_i.size()[:-1], -1)
            want.append(out_i)
        want = torch.stack(want, dim=2).numpy()

    sa = StyleAttention(n_styles=n_styles, latent=latent, n_heads=heads,
                        attn_layers=layers, use_set_decoder=True,
                        use_temperature=True)
    got = sa.apply({"params": params}, jnp.asarray(codes),
                   jnp.asarray(styles))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


# --- ReStyle encoder parity (reference restyle_e4e_encoders.py) ----------

def _load_ref_encoder_module():
    """Import the reference encoder package with torchvision and the
    rosinality CUDA-op module stubbed (models/stylegan2/op compiles a CUDA
    extension at import; EqualLinear's linear path never touches it)."""
    import types

    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet34 = lambda *a, **k: None
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "models.stylegan2.op" not in sys.modules:
        op = types.ModuleType("models.stylegan2.op")
        op.FusedLeakyReLU = torch.nn.LeakyReLU
        op.fused_leaky_relu = lambda *a, **k: None
        op.upfirdn2d = lambda *a, **k: None
        sys.modules["models.stylegan2.op"] = op
    from models.setgan.encoder.encoders import restyle_e4e_encoders
    return torch, restyle_e4e_encoders


@pytest.mark.parametrize("mode", ["ir", "ir_se"])
def test_restyle_encoder_converter_parity(mode):
    """ProgressiveBackboneEncoder with converted reference weights matches
    the reference encoder (restyle_e4e_encoders.py:31-88) — full inference
    stage AND a mid progressive stage (w0 + deltas 1..stage)."""
    torch, ref = _load_ref_encoder_module()
    from stylegan3_editing_tpu.models.encoders import (
        INFERENCE_STAGE, ProgressiveBackboneEncoder)
    from stylegan3_editing_tpu.models.encoders.convert import (
        convert_restyle_encoder_state)

    n_styles = 4
    torch.manual_seed(0)
    tenc = ref.ProgressiveBackboneEncoder(50, mode, n_styles=n_styles,
                                          input_nc=3).eval()
    state = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    variables, info = convert_restyle_encoder_state(state)
    assert info["trunk"] == "irse" and info["mode"] == mode
    assert info["num_layers"] == 50 and info["n_styles"] == n_styles

    enc = ProgressiveBackboneEncoder(num_layers=50, mode=mode,
                                     n_styles=n_styles)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    with torch.no_grad():
        want = tenc(x_t).numpy()  # stage default: all deltas
    got = enc.apply(variables, jnp.asarray(x), stage=INFERENCE_STAGE)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    tenc.progressive_stage = 2
    with torch.no_grad():
        want2 = tenc(x_t).numpy()
    got2 = enc.apply(variables, jnp.asarray(x), stage=2)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=2e-4, atol=2e-4)


def test_restyle_encoder_converter_resnet_tree(tmp_path):
    """ResNet-trunk encoder state (fabricated torchvision-flat layout)
    converts onto ResNetProgressiveBackboneEncoder's exact variable tree
    (reference ResNetProgressiveBackboneEncoder, :91-148; torchvision isn't
    installed here, so this checks tree compatibility, not numerics)."""
    import jax

    from stylegan3_editing_tpu.models.backbones.resnet import RESNET34_LAYERS
    from stylegan3_editing_tpu.models.encoders import (
        ResNetProgressiveBackboneEncoder)
    from stylegan3_editing_tpu.models.encoders.convert import (
        convert_restyle_encoder_state)

    rng = np.random.RandomState(0)

    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    state = {"conv1.weight": t(64, 3, 7, 7), "relu.weight": t(64)}
    for bn in ("bn1",):
        state.update({f"{bn}.weight": t(64), f"{bn}.bias": t(64),
                      f"{bn}.running_mean": t(64), f"{bn}.running_var":
                      np.abs(t(64)) + 1})
    flat = 0
    cin = 64
    for blocks, ch in RESNET34_LAYERS:
        for bi in range(blocks):
            p = f"body.{flat}"
            state[f"{p}.conv1.weight"] = t(ch, cin if bi == 0 else ch, 3, 3)
            state[f"{p}.conv2.weight"] = t(ch, ch, 3, 3)
            for bn in ("bn1", "bn2"):
                state.update({
                    f"{p}.{bn}.weight": t(ch), f"{p}.{bn}.bias": t(ch),
                    f"{p}.{bn}.running_mean": t(ch),
                    f"{p}.{bn}.running_var": np.abs(t(ch)) + 1})
            if bi == 0 and cin != ch:
                state[f"{p}.downsample.0.weight"] = t(ch, cin, 1, 1)
                state.update({
                    f"{p}.downsample.1.weight": t(ch),
                    f"{p}.downsample.1.bias": t(ch),
                    f"{p}.downsample.1.running_mean": t(ch),
                    f"{p}.downsample.1.running_var": np.abs(t(ch)) + 1})
            flat += 1
        cin = ch
    for j in range(2):
        c = 512
        for k in range(4):
            state[f"styles.{j}.convs.{2 * k}.weight"] = t(c, c, 3, 3)
            state[f"styles.{j}.convs.{2 * k}.bias"] = t(c)
        state[f"styles.{j}.linear.weight"] = t(c, c)
        state[f"styles.{j}.linear.bias"] = t(c)

    variables, info = convert_restyle_encoder_state(state)
    assert info == {"trunk": "resnet34", "n_styles": 2}

    enc = ResNetProgressiveBackboneEncoder(n_styles=2)
    ref_shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)))
    ref_flat = dict(jax.tree_util.tree_flatten_with_path(ref_shapes)[0])
    got_flat = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    assert set(ref_flat) == set(got_flat), (
        sorted(set(ref_flat) ^ set(got_flat))[:6])
    for k in ref_flat:
        assert tuple(ref_flat[k].shape) == tuple(got_flat[k].shape), k
    out = enc.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2, 512)
